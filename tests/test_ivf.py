"""IVF kNN: contract + recall-band tests vs the exact kernel.

IVF is the opt-in pruned-search tier (the reference's FAISS use is exact
IndexFlatL2 only, so this EXCEEDS its surface); it trades recall for a
bounded candidate budget. These tests pin the contract pieces that must
be exact (self-matches, returned-distance exactness, shapes, coverage)
and that recall stays in the measured band for a known configuration.
"""
import numpy as np

from vqvae_tpu.ops.ivf import _balance_buckets, knn_search_ivf
from vqvae_tpu.ops.knn import knn_search


def _latents(n, d=16, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1.2, size=(10, d)).astype(np.float32)
    labels = rng.integers(0, 10, size=n)
    return centers[labels] + rng.normal(0, 1.0, size=(n, d)).astype(
        np.float32)


def test_ivf_contract_and_recall_band():
    z = _latents(8192)
    d_ref, i_ref = knn_search(z, 9)
    d, i = knn_search_ivf(z, 9, n_centroids=32, n_probe=16, seed=0)
    assert d.shape == (8192, 9) and i.shape == (8192, 9)
    # every row answered; self-match first with distance 0
    assert (i[:, 0] == np.arange(8192)).mean() > 0.999
    assert (d[:, 0] <= 1e-5).all()
    # distances sorted and exact: whenever the returned index matches the
    # exact kernel's, the distance must match too
    assert (np.diff(d, axis=1) >= -1e-6).all()
    match = i == i_ref
    assert np.abs(np.where(match, d - d_ref, 0.0)).max() < 1e-5
    rec = np.mean([len(set(i_ref[q]) & set(i[q])) / 9
                   for q in range(0, 8192, 17)])
    # 16/32 probed measured ~0.95 on this fixture; 0.92 guards regression
    assert rec >= 0.92, rec


def test_ivf_full_probe_is_exact():
    """Probing every bucket must reproduce the exact kNN result."""
    z = _latents(2048, seed=1)
    d_ref, i_ref = knn_search(z, 7)
    d, i = knn_search_ivf(z, 7, n_centroids=16, n_probe=16, seed=1)
    np.testing.assert_allclose(d, d_ref, rtol=1e-5, atol=1e-5)
    # ties can swap equal-distance neighbors; compare as sets per row
    same = [set(i[q]) == set(i_ref[q]) for q in range(0, 2048, 11)]
    assert np.mean(same) > 0.999


def test_balance_buckets_respects_caps():
    rng = np.random.default_rng(0)
    C, n, cap = 16, 1000, 80  # capacity 1280 > 1000: feasible
    choices = np.stack([rng.permutation(C)[:4] for _ in range(n)])
    labels = _balance_buckets(choices, C, cap)
    assert labels.min() >= 0 and labels.max() < C
    assert np.bincount(labels, minlength=C).max() <= cap
    # heavily skewed wants still respect the cap
    choices[:, 0] = 3
    labels = _balance_buckets(choices, C, cap)
    counts = np.bincount(labels, minlength=C)
    assert counts[3] == cap and counts.sum() == n
