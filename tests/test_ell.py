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
