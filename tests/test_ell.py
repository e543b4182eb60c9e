"""Bucketed ELL relaxation vs scipy Dijkstra oracle."""
import numpy as np
import pytest
from scipy import sparse
from scipy.sparse.csgraph import dijkstra

from vqvae_tpu.ops.ell import BucketedGraph, multi_source_shortest_paths_ell


def _ours(W, sources, **kw):
    g = BucketedGraph.from_csr(W)
    d = multi_source_shortest_paths_ell(g, np.asarray(sources), **kw)
    return np.asarray(d).T


def test_line_graph(line_graph):
    np.testing.assert_allclose(_ours(line_graph, [0])[0], [0, 1, 2, 3],
                               atol=1e-6)


def test_triangle(triangle_graph):
    ref = dijkstra(triangle_graph, directed=False, indices=[0])
    np.testing.assert_allclose(_ours(triangle_graph, [0]), ref, atol=1e-6)


def test_disconnected(disconnected_two_lines):
    d = _ours(disconnected_two_lines, [0])
    assert np.isinf(d[0, 3]) and np.isinf(d[0, 4])


def test_random_graph_matches_scipy(random_latents):
    from vqvae_tpu.ops import build_knn_graph

    W, _ = build_knn_graph(random_latents, k=6, sym="union")
    sources = [0, 17, 55, 123]
    ref = dijkstra(W, directed=False, indices=sources)
    np.testing.assert_allclose(_ours(W, sources), ref, rtol=1e-5, atol=1e-4)


def test_matches_edge_list_engine(random_latents):
    from vqvae_tpu.ops import build_knn_graph
    from vqvae_tpu.ops.shortest_paths import EdgeList, multi_source_shortest_paths

    W, _ = build_knn_graph(random_latents, k=5, sym="mutual")  # fragmented
    sources = np.arange(8, dtype=np.int64)
    a = _ours(W, sources).T
    b = np.asarray(multi_source_shortest_paths(EdgeList.from_csr(W), sources))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_skewed_degrees():
    # star graph: hub has high degree, leaves degree 1 -> multiple buckets
    n = 70
    rows = np.zeros(n - 1, int)
    cols = np.arange(1, n)
    W = sparse.csr_matrix((np.ones(n - 1, np.float32), (rows, cols)),
                          shape=(n, n))
    W = W.maximum(W.T)
    ref = dijkstra(W, directed=False, indices=[5])
    np.testing.assert_allclose(_ours(W, [5]), ref, atol=1e-6)


def test_active_skipping_identical_to_full(random_latents, monkeypatch):
    """Chunk-level frontier skipping must reach the exact full-relaxation
    fixed point — cold start and warm start."""
    from vqvae_tpu.ops import build_knn_graph

    W, _ = build_knn_graph(random_latents, k=6, sym="union")
    g = BucketedGraph.from_csr(W)
    sources = np.asarray([3, 71, 150])

    monkeypatch.setenv("VQVAE_TPU_ELL_ACTIVE", "0")
    full = np.asarray(multi_source_shortest_paths_ell(g, sources))
    monkeypatch.setenv("VQVAE_TPU_ELL_ACTIVE", "1")
    act = np.asarray(multi_source_shortest_paths_ell(g, sources))
    np.testing.assert_array_equal(act, full)

    # warm start from a valid upper bound (distances from a superset pass)
    import jax.numpy as jnp

    # valid warm start: per-entry UPPER bounds (inflated true distances,
    # inf stays inf for disconnected pairs, sources pinned to 0)
    d0_np = full * 1.2 + 0.3
    d0_np[sources, np.arange(len(sources))] = 0.0
    warm_act = np.asarray(multi_source_shortest_paths_ell(
        g, sources, d0=jnp.asarray(d0_np)))
    monkeypatch.setenv("VQVAE_TPU_ELL_ACTIVE", "0")
    warm_full = np.asarray(multi_source_shortest_paths_ell(
        g, sources, d0=jnp.asarray(d0_np)))
    np.testing.assert_array_equal(warm_act, warm_full)
    np.testing.assert_allclose(warm_act, full, atol=1e-6)


def test_active_stats_record_skips(random_latents, monkeypatch):
    from vqvae_tpu.ops import build_knn_graph
    from vqvae_tpu.ops.ell import ELL_STATS

    W, _ = build_knn_graph(random_latents, k=6, sym="union")
    g = BucketedGraph.from_csr(W)
    monkeypatch.setenv("VQVAE_TPU_ELL_STATS", "1")
    monkeypatch.setenv("VQVAE_TPU_ELL_ACTIVE", "1")
    n0 = len(ELL_STATS)
    multi_source_shortest_paths_ell(g, np.asarray([0, 50]))
    rec = ELL_STATS[n0:][-1]
    assert rec["chunk_visits"] >= rec["chunk_relaxed"] > 0
    assert 0 < rec["active_frac"] <= 1
    assert rec["bytes"] > 0

def test_cap_ladder_shapes():
    from vqvae_tpu.ops.ell import _cap_ladder

    caps = _cap_ladder(66)  # default grow=1.5
    assert caps[0] == 8 and caps[-1] >= 66
    assert all(c % 4 == 0 for c in caps)
    assert all(b > a for a, b in zip(caps, caps[1:]))  # strictly increasing


def test_distances_invariant_across_cap_ladders(random_latents, monkeypatch):
    # the ladder changes only layout/padding, never the fixed point
    from vqvae_tpu.ops import build_knn_graph

    W, _ = build_knn_graph(random_latents, k=6, sym="union")
    sources = [0, 17, 55, 123]
    monkeypatch.setenv("VQVAE_TPU_ELL_CAPGROW", "2")
    monkeypatch.setenv("VQVAE_TPU_ELL_MINROWS", "4")  # keep buckets distinct
    d_pow2 = _ours(W, sources)
    monkeypatch.setenv("VQVAE_TPU_ELL_CAPGROW", "1.5")
    d_x15 = _ours(W, sources)
    ref = dijkstra(W, directed=False, indices=sources)
    np.testing.assert_allclose(d_pow2, ref, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(d_x15, ref, rtol=1e-5, atol=1e-4)
