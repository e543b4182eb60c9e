"""Fused Pallas kNN selection kernel vs the exact XLA kernel.

Runs the Pallas kernel in interpreter mode on CPU (the repo's Pallas test
discipline, see tests around ops/pallas_assign.py). In interpret mode the
selection matmul is f32-exact, so whenever every database row has its own
top-2 accumulator slot (n <= 2*bins) the fused path must return *exactly*
the same neighbors as the exact kernel; larger n with deliberately tiny
``bins`` stresses the binned-collision recall bound instead.
"""
import numpy as np
import pytest

from vqvae_tpu.ops.knn import knn_search


def _latents(n, d=16, seed=0, clusters=12):
    rng = np.random.RandomState(seed)
    centers = rng.randn(clusters, d).astype(np.float32) * 3.0
    z = centers[rng.randint(0, clusters, n)]
    return (z + rng.randn(n, d).astype(np.float32) * 0.3).astype(np.float32)


@pytest.mark.parametrize("n", [300, 777, 1024])
def test_fused_matches_exact_small(n):
    z = _latents(n, seed=1)
    d_ref, i_ref = knn_search(z, k=11, kernel="xla")
    d_fus, i_fus = knn_search(z, k=11, kernel="pallas")
    # n <= 2*bins: the accumulator is exhaustive, interpret matmul is f32 —
    # identical results (no near-tie ambiguity expected at this noise scale)
    np.testing.assert_allclose(d_fus, d_ref, rtol=1e-5, atol=1e-5)
    assert (i_fus == i_ref).all()


def test_fused_cosine_matches_exact():
    z = _latents(500, seed=2)
    d_ref, i_ref = knn_search(z, k=8, metric="cosine", kernel="xla")
    d_fus, i_fus = knn_search(z, k=8, metric="cosine", kernel="pallas")
    np.testing.assert_allclose(d_fus, d_ref, rtol=1e-5, atol=1e-5)
    assert (i_fus == i_ref).all()


def test_fused_multi_tile_exactness():
    # n > db_tile: several db tiles stream through the accumulators while
    # the result stays exhaustive (n <= 2*bins), exercising the
    # cross-tile top-2 update and the global index offsets
    z = _latents(1800, seed=3)
    d_ref, i_ref = knn_search(z, k=11, kernel="xla")
    d_fus, i_fus = knn_search(z, k=11, kernel="pallas", db_tile=512)
    np.testing.assert_allclose(d_fus, d_ref, rtol=1e-5, atol=1e-5)
    assert (i_fus == i_ref).all()


def test_fused_binned_recall_under_collisions():
    # 4096 rows into 128 bins (top-2 each): expected neighbor loss
    # ~ k*C(k-1,2)/bins^2 ~ 2% at k=10 — assert comfortably above the
    # floor while well below exactness, proving the bound is doing work
    n, k = 4096, 10
    z = _latents(n, seed=4)
    _, i_ref = knn_search(z, k=k, kernel="xla")
    import os

    os.environ["VQVAE_TPU_KNN_BINS"] = "128"
    try:
        _, i_fus = knn_search(z, k=k, kernel="pallas", db_tile=512)
    finally:
        del os.environ["VQVAE_TPU_KNN_BINS"]
    ref_sets = [set(r) for r in i_ref]
    recall = np.mean([len(ref_sets[q].intersection(i_fus[q])) / k
                      for q in range(n)])
    assert recall >= 0.95, recall


def test_fused_sharded_matches_single_device():
    import jax
    from jax.sharding import Mesh

    z = _latents(1024, seed=5)
    d_one, i_one = knn_search(z, k=9, kernel="pallas")
    devices = np.array(jax.devices("cpu")[:8])
    with Mesh(devices, ("data",)) as mesh:
        d_mesh, i_mesh = knn_search(z, k=9, kernel="pallas", mesh=mesh)
    np.testing.assert_allclose(d_mesh, d_one, rtol=1e-6, atol=1e-6)
    assert (i_mesh == i_one).all()


def test_fused_env_kernel_select(monkeypatch):
    z = _latents(400, seed=6)
    d_ref, i_ref = knn_search(z, k=6)
    monkeypatch.setenv("VQVAE_TPU_KNN_KERNEL", "pallas")
    d_fus, i_fus = knn_search(z, k=6)
    np.testing.assert_allclose(d_fus, d_ref, rtol=1e-5, atol=1e-5)
    assert (i_fus == i_ref).all()


def test_fused_sel_tile_invariance(monkeypatch):
    # sel_tile changes only the Pallas block decomposition (db restream
    # granularity), never results; it is part of the compiled-fn cache key,
    # so flipping the env between calls must actually rebuild the kernel
    z = _latents(1024, seed=7)
    d_128, i_128 = knn_search(z, k=9, kernel="pallas")
    monkeypatch.setenv("VQVAE_TPU_KNN_SELTILE", "256")
    d_256, i_256 = knn_search(z, k=9, kernel="pallas")
    np.testing.assert_allclose(d_256, d_128, rtol=1e-6, atol=1e-6)
    assert (i_256 == i_128).all()


@pytest.mark.parametrize("n", [300, 1024, 1800])
def test_packed_matches_unpacked(n, monkeypatch):
    # packed keys truncate blk_bits low mantissa bits of the SELECTION
    # value only; with an exhaustive accumulator (n <= 2*bins) and the
    # exact f32 re-rank the returned neighbors must be identical
    z = _latents(n, seed=8)
    d_ref, i_ref = knn_search(z, k=11, kernel="pallas", db_tile=512)
    monkeypatch.setenv("VQVAE_TPU_KNN_PACKED", "1")
    d_pk, i_pk = knn_search(z, k=11, kernel="pallas", db_tile=512)
    np.testing.assert_allclose(d_pk, d_ref, rtol=1e-6, atol=1e-6)
    assert (i_pk == i_ref).all()


def test_packed_cosine_matches_exact(monkeypatch):
    z = _latents(500, seed=9)
    d_ref, i_ref = knn_search(z, k=8, metric="cosine", kernel="xla")
    monkeypatch.setenv("VQVAE_TPU_KNN_PACKED", "1")
    d_pk, i_pk = knn_search(z, k=8, metric="cosine", kernel="pallas")
    np.testing.assert_allclose(d_pk, d_ref, rtol=1e-5, atol=1e-5)
    assert (i_pk == i_ref).all()


def test_packed_binned_recall_under_collisions(monkeypatch):
    # same collision-stress shape as the unpacked test: the packed top-2
    # update must lose no more neighbors than the binning bound predicts
    n, k = 4096, 10
    z = _latents(n, seed=4)
    _, i_ref = knn_search(z, k=k, kernel="xla")
    monkeypatch.setenv("VQVAE_TPU_KNN_BINS", "128")
    monkeypatch.setenv("VQVAE_TPU_KNN_PACKED", "1")
    _, i_pk = knn_search(z, k=k, kernel="pallas", db_tile=512)
    ref_sets = [set(r) for r in i_ref]
    recall = np.mean([len(ref_sets[q].intersection(i_pk[q])) / k
                      for q in range(n)])
    assert recall >= 0.95, recall


@pytest.mark.parametrize("packed", ["0", "1"])
def test_fused_exact_duplicates_and_ties(packed, monkeypatch):
    # 50 clusters of 30 near-identical points (spread ~1e-6): squared
    # distances cancel to ~0 (the packed path clamps tiny negatives before
    # the monotonic bitcast) and selection values tie below the truncation
    # threshold. Returned DISTANCES must still match the exact kernel --
    # indices may permute within exact ties, so compare the sorted exact
    # re-ranked distances only.
    rng = np.random.RandomState(11)
    centers = rng.randn(50, 16).astype(np.float32) * 5.0
    z = np.repeat(centers, 30, axis=0)
    z += rng.randn(*z.shape).astype(np.float32) * 1e-6
    d_ref, _ = knn_search(z, k=11, kernel="xla")
    monkeypatch.setenv("VQVAE_TPU_KNN_PACKED", packed)
    d_fus, _ = knn_search(z, k=11, kernel="pallas", db_tile=512)
    np.testing.assert_allclose(d_fus, d_ref, rtol=1e-4, atol=1e-5)


def test_unknown_kernel_raises():
    with pytest.raises(ValueError):
        knn_search(_latents(64), k=3, kernel="cuda")
