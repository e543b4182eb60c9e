"""Native C++ host library vs scipy/sklearn oracles."""
import numpy as np
import pytest
from scipy.sparse.csgraph import connected_components as sp_cc, dijkstra

native = pytest.importorskip("vqvae_tpu.native")

if not native.available():
    pytest.skip("g++ toolchain unavailable", allow_module_level=True)


def test_dijkstra_matches_scipy(random_latents):
    from vqvae_tpu.ops import build_knn_graph

    W, _ = build_knn_graph(random_latents, k=6, sym="union")
    sources = np.asarray([0, 13, 77, 150], np.int32)
    ours = native.dijkstra_multi_source(W, sources)
    ref = dijkstra(W, directed=False, indices=sources)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_dijkstra_disconnected(disconnected_two_lines):
    d = native.dijkstra_multi_source(disconnected_two_lines, [0])
    assert np.isinf(d[0, 3]) and np.isinf(d[0, 4])
    np.testing.assert_allclose(d[0, :3], [0, 1, 2], atol=1e-6)


def test_negative_weight_raises(line_graph):
    W = line_graph.copy()
    W.data[0] = -1.0
    with pytest.raises(ValueError):
        native.dijkstra_multi_source(W, [0])


def test_connected_components(disconnected_two_lines):
    n, labels = native.connected_components(disconnected_two_lines)
    n_ref, ref = sp_cc(disconnected_two_lines, directed=False)
    assert n == n_ref
    # our labels are min-node-index canonical
    assert labels.tolist() == [0, 0, 0, 3, 3]


def test_knn_matches_sklearn(random_latents):
    from sklearn.neighbors import NearestNeighbors

    k = 6
    nn = NearestNeighbors(n_neighbors=k).fit(random_latents)
    ref_d, ref_i = nn.kneighbors(random_latents)
    d, i = native.knn_exact(random_latents, k)
    np.testing.assert_allclose(d, ref_d, rtol=1e-4, atol=1e-5)
    overlap = np.mean([len(set(i[r]) & set(ref_i[r])) / k
                       for r in range(len(random_latents))])
    assert overlap > 0.999


def _scipy_assemble(dists, idxs, n, mode, sym):
    from scipy import sparse

    data = (dists.ravel() if mode == "distance"
            else np.ones(dists.size, np.float32))
    rows = np.repeat(np.arange(n), idxs.shape[1])
    W = sparse.csr_matrix((data.astype(np.float32), (rows, idxs.ravel())),
                          shape=(n, n))
    W = W.minimum(W.T) if sym == "mutual" else W.maximum(W.T)
    W.setdiag(0.0)
    W.eliminate_zeros()
    return W


@pytest.mark.parametrize("mode", ["distance", "connectivity"])
@pytest.mark.parametrize("sym", ["union", "mutual"])
def test_knn_assemble_matches_scipy(mode, sym):
    rng = np.random.default_rng(0)
    n, k = 400, 7
    z = rng.normal(size=(n, 8)).astype(np.float32)
    z[50] = z[10]  # exact duplicate -> a zero-distance edge
    z[51] = z[10]
    from vqvae_tpu.ops.knn import knn_search

    dists, idxs = knn_search(z, k)
    ours = native.knn_assemble(dists, idxs, n, mode, sym)
    ref = _scipy_assemble(dists, idxs, n, mode, sym)
    assert (ours != ref).nnz == 0
    np.testing.assert_array_equal(ours.indptr, ref.tocsr().indptr)


@pytest.mark.parametrize("sym", ["union", "mutual"])
def test_build_knn_graph_native_routing(monkeypatch, sym):
    # force the native assembly path through the public builder and pin it
    # against the scipy path on the same input
    rng = np.random.default_rng(1)
    z = rng.normal(size=(500, 6)).astype(np.float32)
    from vqvae_tpu.ops import build_knn_graph

    monkeypatch.setenv("VQVAE_TPU_ASSEMBLE_NATIVE_MIN", "1")
    W_native, _ = build_knn_graph(z, k=6, sym=sym)
    monkeypatch.setenv("VQVAE_TPU_ASSEMBLE_NATIVE_MIN", str(10**12))
    W_scipy, _ = build_knn_graph(z, k=6, sym=sym)
    assert (W_native != W_scipy).nnz == 0


def test_knn_assemble_self_and_padding():
    # self-matches in the neighbor lists and -1 padding are both dropped
    idxs = np.array([[0, 1, -1], [1, 0, 2], [2, 1, -1]], np.int64)
    dists = np.array([[0.0, 1.0, 0.0], [0.0, 1.0, 2.0], [0.0, 2.0, 0.0]],
                     np.float32)
    W = native.knn_assemble(dists, idxs, 3, "distance", "union")
    assert W.diagonal().sum() == 0
    assert W[0, 1] == 1.0 and W[1, 0] == 1.0
    assert W[1, 2] == 2.0 and W[2, 1] == 2.0
    assert W.nnz == 4


def test_threaded_multi_source_consistency(random_latents):
    from vqvae_tpu.ops import build_knn_graph

    W, _ = build_knn_graph(random_latents, k=6, sym="union")
    sources = np.arange(32, dtype=np.int32)
    a = native.dijkstra_multi_source(W, sources)
    b = np.stack([native.dijkstra_multi_source(W, [s])[0] for s in sources])
    np.testing.assert_allclose(a, b)


def test_edges_assemble_matches_scipy():
    from scipy import sparse

    rng = np.random.default_rng(3)
    n = 600
    r = rng.integers(0, n, size=4000)
    c = rng.integers(0, n, size=4000)
    lo, hi = np.minimum(r, c), np.maximum(r, c)
    key = np.unique(lo[lo != hi] * n + hi[lo != hi])
    rows, cols = (key // n).astype(np.int64), (key % n).astype(np.int64)
    w = (rng.random(rows.size) + 0.01).astype(np.float32)
    A = native.edges_assemble(rows, cols, w, n)
    B = sparse.csr_matrix((w, (rows, cols)), shape=(n, n))
    B = B + B.T
    assert (A != B).nnz == 0
    # per-row sorted columns (scipy consumers rely on it)
    A2 = A.copy()
    A2.sort_indices()
    assert np.array_equal(A2.indices, A.indices)


def test_symmetric_csr_from_edges_routes(monkeypatch):
    from scipy import sparse

    from vqvae_tpu.ops import symmetric_csr_from_edges

    rng = np.random.default_rng(5)
    n = 300
    rows = np.arange(n - 1, dtype=np.int64)
    cols = rows + 1  # path graph + a few chords
    extra_r = rng.integers(0, n - 20, size=40).astype(np.int64)
    extra_c = extra_r + rng.integers(2, 19, size=40)
    key = np.unique(np.concatenate([rows * n + cols,
                                    extra_r * n + extra_c]))
    rows, cols = (key // n).astype(np.int64), (key % n).astype(np.int64)
    w = (rng.random(rows.size) + 0.01).astype(np.float32)
    ref = sparse.csr_matrix((w, (rows, cols)), shape=(n, n))
    ref = ref + ref.T
    monkeypatch.setenv("VQVAE_TPU_ASSEMBLE_NATIVE_MIN", "1")
    W_native = symmetric_csr_from_edges(rows, cols, w, n)
    monkeypatch.setenv("VQVAE_TPU_ASSEMBLE_NATIVE_MIN", str(10**12))
    W_scipy = symmetric_csr_from_edges(rows, cols, w, n)
    assert (W_native != ref).nnz == 0
    assert (W_scipy != ref).nnz == 0


def test_lcc_native_route_matches_scipy(disconnected_two_lines, monkeypatch):
    from vqvae_tpu.ops import largest_connected_component

    monkeypatch.setenv("VQVAE_TPU_ASSEMBLE_NATIVE_MIN", "1")
    m_native = largest_connected_component(disconnected_two_lines)
    monkeypatch.setenv("VQVAE_TPU_ASSEMBLE_NATIVE_MIN", str(10**12))
    m_scipy = largest_connected_component(disconnected_two_lines)
    assert np.array_equal(m_native, m_scipy)
    assert m_native.tolist() == [True, True, True, False, False]
