"""Cross-stack parity oracle: our geodesic K-medoids vs the REFERENCE
implementation (sklearn kNN + scipy Dijkstra + sequential k-means++) on
identical latents.

The reference algorithm is re-run here verbatim-in-spirit (reference
src/geo/kmeans_optimized.py:14-138: sequential d^2-sampled k-means++ with
one single-source Dijkstra per center, one K-source assignment pass, QE =
sum of squared finite distances) on the same graph our ``fit_kmedoids``
consumes — so the assertion pins parity against the *reference stack*, not
just framework-internal consistency. Exact medoid indices cannot match
across frameworks (different RNG streams); parity is defined on the
clustering objective (QE ratio) and cluster structure (pairwise
co-assignment agreement), the same tolerance philosophy as SURVEY.md §7
hard-part 2.
"""
import numpy as np
from scipy.sparse.csgraph import dijkstra

from vqvae_tpu.ops import build_knn_graph, fit_kmedoids


def _make_latents(n, dim=16, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1.2, size=(10, dim)).astype(np.float32)
    labels = rng.integers(0, 10, size=n)
    return (centers[labels]
            + rng.normal(0, 1.0, size=(n, dim)).astype(np.float32))


def _reference_kmedoids(W, K, seed):
    """The reference's fit_kmedoids_optimized control flow on scipy."""
    n = W.shape[0]
    rng = np.random.RandomState(seed)
    centers = [int(rng.randint(0, n))]
    d_min = np.full(n, np.inf, np.float32)
    for _ in range(1, K):
        d = dijkstra(W, directed=False, indices=[centers[-1]])[0]
        d_min = np.minimum(d_min, d.astype(np.float32))
        finite = np.isfinite(d_min)
        safe = np.where(finite, d_min,
                        (d_min[finite].max() * 2.0) if finite.any() else 1.0)
        probs = safe.astype(np.float64) ** 2
        probs[np.asarray(centers)] = 0.0
        s = probs.sum()
        if s > 0:
            centers.append(int(rng.choice(n, p=probs / s)))
        else:
            centers.append(int(rng.choice(
                np.setdiff1d(np.arange(n), np.asarray(centers)))))
    D = dijkstra(W, directed=False, indices=np.asarray(centers))  # (K, N)
    assign = D.argmin(axis=0)
    dist = D[assign, np.arange(n)]
    finite = np.isfinite(dist)
    qe = float(np.sum(dist[finite].astype(np.float64) ** 2))
    return np.asarray(centers), assign, qe


def _pair_agreement(a, b, n_pairs, seed=3):
    """Fraction of sampled node pairs on which two clusterings agree
    (co-assigned in both or separated in both)."""
    rng = np.random.default_rng(seed)
    i = rng.integers(0, len(a), size=n_pairs)
    j = rng.integers(0, len(a), size=n_pairs)
    keep = i != j
    i, j = i[keep], j[keep]
    return float(np.mean((a[i] == a[j]) == (b[i] == b[j])))


def _co_recall(a, b, n_pairs=400_000, seed=5):
    """Among sampled pairs clustering ``a`` co-assigns, the fraction ``b``
    also co-assigns."""
    rng = np.random.default_rng(seed)
    i = rng.integers(0, len(a), size=n_pairs)
    j = rng.integers(0, len(a), size=n_pairs)
    co_a = (a[i] == a[j]) & (i != j)
    return float((b[i[co_a]] == b[j[co_a]]).mean())


def test_kmedoids_matches_reference_stack():
    z = _make_latents(16384, seed=0)
    W, _ = build_knn_graph(z, k=10, metric="euclidean", mode="distance",
                           sym="union")
    K = 64

    ref_centers, ref_assign, ref_qe = _reference_kmedoids(W, K, seed=42)
    medoids, assign, qe = fit_kmedoids(W, K=K, init="kpp_parallel", seed=42,
                                       backend="device",
                                       assume_symmetric=True)

    assert len(medoids) == K
    assert np.isfinite(qe) and np.isfinite(ref_qe)
    # clustering objective parity: ours must be within 3% of the reference
    # stack's QE on the identical graph (and may beat it)
    assert qe / ref_qe <= 1.03, (qe, ref_qe)

    # cluster-structure parity, CALIBRATED against the reference's own
    # seed-to-seed variability: k-means++ is a randomized algorithm, so two
    # reference runs with different seeds define the "same structure" band.
    # Measured on this fixture: ref-vs-ref overall pair agreement
    # 0.960-0.964, co-assignment recall (fraction of pairs one run
    # co-assigns that the other also co-assigns) 0.200-0.213, QE
    # self-ratio up to 1.075 — so the 1.03 QE gate above is *stricter*
    # than the reference holds itself to. Ours-vs-ref must land inside
    # that band.
    _, ref2_assign, _ = _reference_kmedoids(W, K, seed=7)
    band_agree = _pair_agreement(ref_assign, ref2_assign, n_pairs=200_000)
    band_co = _co_recall(ref_assign, ref2_assign)
    agree = _pair_agreement(ref_assign, assign, n_pairs=200_000)
    co = _co_recall(ref_assign, assign)
    assert agree >= band_agree - 0.02, (agree, band_agree)
    assert co >= 0.85 * band_co, (co, band_co)


def test_exact_kpp_matches_reference_stack():
    """The exact sequential init path must track the reference even more
    tightly (same algorithm, different Dijkstra engine + RNG)."""
    z = _make_latents(4096, seed=1)
    W, _ = build_knn_graph(z, k=10, metric="euclidean", mode="distance",
                           sym="union")
    K = 32
    _, _, ref_qe = _reference_kmedoids(W, K, seed=7)
    _, _, qe = fit_kmedoids(W, K=K, init="kpp", seed=7, backend="device",
                            assume_symmetric=True)
    assert qe / ref_qe <= 1.05, (qe, ref_qe)


@__import__("pytest").mark.slow
def test_kmedoids_matches_reference_stack_midscale():
    """VERDICT r3 item 5: one scale step up (196k nodes, K=64) — the
    largest direct ours-vs-reference QE comparison. Same calibrated-band
    protocol as the 16k case; the sequential reference loop is the cost
    (63 + 64 single-source Dijkstras at 196k)."""
    z = _make_latents(196_608, seed=0)
    W, _ = build_knn_graph(z, k=10, metric="euclidean", mode="distance",
                           sym="union")
    K = 64

    ref_centers, ref_assign, ref_qe = _reference_kmedoids(W, K, seed=42)
    medoids, assign, qe = fit_kmedoids(W, K=K, init="kpp_parallel", seed=42,
                                       backend="device",
                                       assume_symmetric=True)
    assert len(medoids) == K
    assert np.isfinite(qe) and np.isfinite(ref_qe)
    assert qe / ref_qe <= 1.03, (qe, ref_qe)

    _, ref2_assign, _ = _reference_kmedoids(W, K, seed=7)
    band_agree = _pair_agreement(ref_assign, ref2_assign, n_pairs=200_000)
    band_co = _co_recall(ref_assign, ref2_assign)
    agree = _pair_agreement(ref_assign, assign, n_pairs=200_000)
    co = _co_recall(ref_assign, assign)
    assert agree >= band_agree - 0.02, (agree, band_agree)
    assert co >= 0.85 * band_co, (co, band_co)
