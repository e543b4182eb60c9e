"""Shortest-path tests vs scipy Dijkstra oracle (reference
tests/test_geo_shortest_paths.py)."""
import numpy as np
import pytest
from scipy import sparse
from scipy.sparse.csgraph import dijkstra

from vqvae_tpu.ops import (
    multi_source_shortest_paths,
    single_source_shortest_paths,
    distances_between,
)
from vqvae_tpu.ops.shortest_paths import EdgeList


def _ours(W, sources, **kw):
    d = multi_source_shortest_paths(EdgeList.from_csr(W), np.asarray(sources), **kw)
    return np.asarray(d).T  # scipy layout (K, N)


def test_line_graph_exact(line_graph):
    D = _ours(line_graph, [0])
    np.testing.assert_allclose(D[0], [0, 1, 2, 3], atol=1e-6)


def test_triangle_weighted(triangle_graph):
    D = _ours(triangle_graph, [0])
    ref = dijkstra(triangle_graph, directed=False, indices=[0])
    np.testing.assert_allclose(D, ref, atol=1e-6)


def test_single_vs_multi_source_consistency(line_graph):
    d_multi = _ours(line_graph, [0, 2])
    d0 = np.asarray(single_source_shortest_paths(EdgeList.from_csr(line_graph), 0))
    np.testing.assert_allclose(d_multi[0], d0, atol=1e-6)


def test_unweighted_mode(triangle_graph):
    D = _ours(triangle_graph, [0], unweighted=True)
    ref = dijkstra(triangle_graph, directed=False, indices=[0], unweighted=True)
    np.testing.assert_allclose(D, ref, atol=1e-6)


def test_unreachable_is_inf(disconnected_two_lines):
    D = _ours(disconnected_two_lines, [0])
    assert np.isinf(D[0, 3]) and np.isinf(D[0, 4])
    assert np.isfinite(D[0, :3]).all()


def test_distances_between_subselect(line_graph):
    el = EdgeList.from_csr(line_graph)
    sub = np.asarray(distances_between(el, [0, 1], [2, 3]))
    full = _ours(line_graph, [0, 1])
    np.testing.assert_allclose(sub, full[:, [2, 3]], atol=1e-6)


def test_empty_sources_raise(line_graph):
    with pytest.raises(ValueError):
        multi_source_shortest_paths(EdgeList.from_csr(line_graph), np.asarray([], np.int64))


def test_negative_weights_raise():
    W = sparse.csr_matrix(np.array([[0, -1.0], [-1.0, 0]]))
    with pytest.raises(ValueError):
        EdgeList.from_csr(W)


def test_non_square_raises():
    W = sparse.csr_matrix(np.ones((2, 3), np.float32))
    with pytest.raises(ValueError):
        EdgeList.from_csr(W)


def test_random_graph_matches_scipy(random_latents):
    from vqvae_tpu.ops import build_knn_graph

    W, _ = build_knn_graph(random_latents, k=6, sym="union")
    sources = [0, 17, 55, 123]
    D = _ours(W, sources)
    ref = dijkstra(W, directed=False, indices=sources)
    np.testing.assert_allclose(D, ref, rtol=1e-5, atol=1e-4)


def test_warm_start_matches_fresh(line_graph):
    import jax.numpy as jnp

    el = EdgeList.from_csr(line_graph)
    fresh = np.asarray(multi_source_shortest_paths(el, np.asarray([0, 3])))
    d0 = jnp.full((4, 2), jnp.inf).at[0, 0].set(0.0).at[3, 1].set(0.0)
    warm = np.asarray(multi_source_shortest_paths(el, np.asarray([0, 3]), d0=d0))
    np.testing.assert_allclose(fresh, warm)
