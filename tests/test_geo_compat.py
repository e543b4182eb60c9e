"""Reference-API compat wrapper tests (mirrors reference
tests/test_geo_shortest_paths.py incl. predecessors/dtype checks)."""
import numpy as np
import pytest
from scipy import sparse
from scipy.sparse.csgraph import dijkstra as sp_dijkstra

from vqvae_tpu.ops.geo_compat import (dijkstra_multi_source,
                                      dijkstra_single_source,
                                      distances_between, ensure_valid_graph)


def test_layout_and_dtype(line_graph):
    D = dijkstra_multi_source(line_graph, [0, 2])
    assert D.shape == (2, 4)
    assert D.dtype == np.float32
    np.testing.assert_allclose(D[0], [0, 1, 2, 3], atol=1e-5)


def test_predecessors_match_scipy(random_latents):
    from vqvae_tpu.ops import build_knn_graph

    W, _ = build_knn_graph(random_latents, k=6, sym="union")
    D, P = dijkstra_multi_source(W, [0, 7], return_predecessors=True)
    D_ref, P_ref = sp_dijkstra(W, directed=False, indices=[0, 7],
                               return_predecessors=True)
    np.testing.assert_allclose(D, D_ref, rtol=1e-5, atol=1e-5)
    assert P.dtype == np.int32
    # predecessors may differ on equal-cost paths; verify each implied path
    # step is consistent: dist[v] == dist[pred[v]] + w(pred[v], v)
    Wd = W.toarray()
    for row in range(2):
        for v in range(W.shape[0]):
            p = P[row, v]
            if p == -9999:
                continue
            assert Wd[p, v] > 0
            np.testing.assert_allclose(D[row, v], D[row, p] + Wd[p, v],
                                       rtol=1e-4)


def test_unweighted_hop_counts(triangle_graph):
    D = dijkstra_multi_source(triangle_graph, [0], unweighted=True)
    ref = sp_dijkstra(triangle_graph, directed=False, indices=[0],
                      unweighted=True)
    np.testing.assert_allclose(D, ref, atol=1e-6)


def test_single_source_with_preds(line_graph):
    d, p = dijkstra_single_source(line_graph, 0, return_predecessors=True)
    assert d.shape == (4,) and p.shape == (4,)
    assert p[0] == -9999 and p[1] == 0 and p[2] == 1


def test_distances_between(line_graph):
    sub = distances_between(line_graph, [0, 1], [2, 3])
    np.testing.assert_allclose(sub, [[2, 3], [1, 2]], atol=1e-5)


def test_validation_errors():
    with pytest.raises(TypeError):
        ensure_valid_graph(np.ones((3, 3)))
    with pytest.raises(ValueError):
        ensure_valid_graph(sparse.csr_matrix(np.ones((2, 3))))
    W = sparse.csr_matrix(np.array([[0, -1.0], [0, 0]]))
    with pytest.raises(ValueError):
        ensure_valid_graph(W)
    with pytest.raises(ValueError):
        dijkstra_multi_source(sparse.eye(3).tocsr(), [])
