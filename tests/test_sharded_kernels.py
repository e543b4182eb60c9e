"""Mesh-sharded geo kernels must match their single-device results exactly.

SURVEY.md §2.2 commits the FAISS-replacement kNN (and the rest of the
codebook-stage kernels) to chip sharding; these tests pin, on the 8-device
virtual CPU mesh, that the sharded paths (a) produce identical results and
(b) physically split the work axis across devices. The driver's
``dryrun_multichip`` exercises the same paths from a cold process.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import sparse

from vqvae_tpu.ops.ell import BucketedGraph, multi_source_shortest_paths_ell
from vqvae_tpu.ops.kmedoids import fit_kmedoids
from vqvae_tpu.ops.knn import knn_search
from vqvae_tpu.ops.riemannian import edge_lengths_riemannian
from vqvae_tpu.parallel import get_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh")


@pytest.fixture(scope="module")
def mesh():
    return get_mesh(8)


def test_knn_sharded_matches_single_device(mesh):
    rng = np.random.RandomState(0)
    z = rng.rand(1000, 12).astype(np.float32)
    d_ref, i_ref = knn_search(z, k=7)
    d_sh, i_sh = knn_search(z, k=7, mesh=mesh, query_tile=32)
    np.testing.assert_allclose(d_sh, d_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(i_sh, i_ref)


def test_knn_sharded_cosine(mesh):
    rng = np.random.RandomState(1)
    z = rng.randn(500, 6).astype(np.float32)
    d_ref, i_ref = knn_search(z, k=5, metric="cosine")
    d_sh, i_sh = knn_search(z, k=5, metric="cosine", mesh=mesh,
                            query_tile=16)
    np.testing.assert_allclose(d_sh, d_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(i_sh, i_ref)


def test_riemannian_sharded_matches(mesh):
    rng = np.random.RandomState(2)
    Wd = jnp.asarray(rng.rand(8, 40).astype(np.float32))

    def decode(z):
        return jnp.tanh(z @ Wd)

    za = rng.randn(300, 8).astype(np.float32)
    zb = rng.randn(300, 8).astype(np.float32)
    ref = edge_lengths_riemannian(decode, za, zb, batch_size=32)
    sh = edge_lengths_riemannian(decode, za, zb, batch_size=32, mesh=mesh)
    np.testing.assert_allclose(sh, ref, rtol=1e-5, atol=1e-6)


def test_riemannian_fused_matches_unfused(mesh):
    rng = np.random.RandomState(3)
    Wd = jnp.asarray(rng.rand(4, 16).astype(np.float32))

    def decode(z):
        return jax.nn.sigmoid(z @ Wd)

    za = rng.randn(100, 4).astype(np.float32)
    zb = rng.randn(100, 4).astype(np.float32)
    a = edge_lengths_riemannian(decode, za, zb, batch_size=16, fused=False)
    b = edge_lengths_riemannian(decode, za, zb, batch_size=16, fused=True)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def _random_graph(n, k, seed):
    rng = np.random.RandomState(seed)
    z = rng.rand(n, 3).astype(np.float32)
    from vqvae_tpu.ops.graph import build_knn_graph

    W, _ = build_knn_graph(z, k=k, mode="distance", sym="union")
    return W


def test_ell_k_sharded_matches_oracle(mesh):
    W = _random_graph(120, 5, seed=4)
    from scipy.sparse.csgraph import dijkstra

    sources = np.arange(16)
    bg = BucketedGraph.from_csr(W)
    d_sh = multi_source_shortest_paths_ell(bg, sources, mesh=mesh)
    # the solver must preserve physical K shards end to end
    shards = d_sh.addressable_shards
    assert len(shards) == 8
    assert all(s.data.shape == (120, 2) for s in shards)
    oracle = dijkstra(W, directed=False, indices=sources).T
    np.testing.assert_allclose(np.asarray(d_sh), oracle, rtol=1e-5,
                               atol=1e-5)


def test_fit_kmedoids_sharded_matches(mesh):
    W = _random_graph(400, 6, seed=5)
    # K chosen so per-round source blocks divide the mesh
    K = 33
    ref = fit_kmedoids(W, K=K, init="kpp_parallel", seed=11,
                       backend="device")
    sh = fit_kmedoids(W, K=K, init="kpp_parallel", seed=11,
                      backend="device", mesh=mesh)
    np.testing.assert_array_equal(sh[0], ref[0])
    np.testing.assert_array_equal(sh[1], ref[1])
    np.testing.assert_allclose(sh[2], ref[2], rtol=1e-5)


def test_ell_uneven_k_falls_back_replicated(mesh):
    W = _random_graph(60, 4, seed=6)
    from scipy.sparse.csgraph import dijkstra

    sources = np.arange(5)  # 5 % 8 != 0 -> must still be correct
    bg = BucketedGraph.from_csr(W)
    d = np.asarray(multi_source_shortest_paths_ell(bg, sources, mesh=mesh))
    oracle = dijkstra(W, directed=False, indices=sources).T
    np.testing.assert_allclose(d, oracle, rtol=1e-5, atol=1e-5)


def test_ell_k_sharded_hlo_has_no_data_collectives(mesh):
    """Mechanically verify docs/multichip.md's zero-data-collective claim.

    The K-sharded solver's contract (ops/ell.py:multi_source_shortest_paths_ell
    docstring): every op in the sweep is K-elementwise, so GSPMD partitions
    the whole while-loop with NO collectives on (N, K)-sized f32 distance
    data — the only allowed collective is the bool row-changed any-reduce
    (pred[chunk], ~N bool bytes per sweep). This inspects the compiled HLO
    on the 8-device mesh and asserts exactly that, so a future regression
    (e.g. an op that breaks the K-elementwise property and makes GSPMD
    insert per-sweep all-gathers) fails loudly instead of silently costing
    ICI bandwidth at scale.
    """
    import re

    from jax.sharding import NamedSharding, PartitionSpec as P

    from vqvae_tpu.ops.ell import _ell_run
    from vqvae_tpu.parallel.mesh import DATA_AXIS

    W = _random_graph(128, 5, seed=7)
    bg = BucketedGraph.from_csr(W)
    k = 16
    sources = np.arange(k)
    d0 = jnp.full((128, k), jnp.inf).at[sources, jnp.arange(k)].set(0.0)
    d0 = jax.device_put(d0, NamedSharding(mesh, P(None, DATA_AXIS)))
    hlo = _ell_run.lower(bg.nbrs, bg.wts, bg.perm_nodes, bg.inv_perm,
                         d0, jnp.int32(129), False).compile().as_text()

    for banned in ("all-gather(", "all-gather-start(", "all-to-all(",
                   "collective-permute(", "reduce-scatter("):
        assert banned not in hlo, f"unexpected {banned} in solver HLO"

    # every all-reduce must be on bool row-flags (pred[chunk]), never on
    # f32 distance data. HLO shapes look like `pred[128]{0} all-reduce(`.
    shapes = re.findall(r"= (\w+)\[([\d,]*)\](?:\{[\d,]*\})? all-reduce",
                        hlo)
    assert shapes, "expected the row-changed any-reduce in the sharded HLO"
    for dtype, dims in shapes:
        assert dtype == "pred", (
            f"all-reduce on {dtype}[{dims}] in solver HLO — data collective")
        n_elems = int(np.prod([int(d) for d in dims.split(",") if d] or [1]))
        assert n_elems <= 128, (  # one chunk of row flags at this shape
            f"all-reduce on oversized pred[{dims}] in solver HLO")
