"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vqvae_tpu.parallel import get_mesh, shard_batch, data_sharding


def test_mesh_has_eight_devices():
    mesh = get_mesh()
    assert len(mesh.devices.ravel()) == 8


def test_shard_batch_places_batch_axis():
    mesh = get_mesh()
    x = np.zeros((16, 4, 4, 1), np.float32)
    xd, = shard_batch(mesh, (jnp.asarray(x),))
    assert xd.sharding == data_sharding(mesh, 4)


def test_dp_vae_grads_match_single_device():
    """Data-parallel gradients over the mesh == single-device gradients."""
    from vqvae_tpu.models import VAE
    from vqvae_tpu.models.vae import elbo_loss

    model = VAE(in_channels=1, latent_dim=4, topology="spatial",
                output_image_size=28, norm_type="none", recon_loss="mse",
                enc_channels=(4, 8, 16), dec_channels=(16, 8, 4))
    rng = jax.random.key(0)
    x = jax.random.uniform(jax.random.key(1), (16, 28, 28, 1))
    variables = model.init({"params": rng}, x[:1])

    def loss_fn(params, xb):
        logits, mu, logvar, _ = model.apply({"params": params}, xb, rng, False)
        total, _, _ = elbo_loss(xb, logits, mu, logvar, recon_loss="mse",
                                mse_use_sigmoid=True, topology="spatial",
                                beta=1.0)
        return total

    g_single = jax.grad(loss_fn)(variables["params"], x)

    mesh = get_mesh()
    xs = jax.device_put(x, data_sharding(mesh, 4))
    ps = jax.device_put(variables["params"],
                        NamedSharding(mesh, P()))
    g_sharded = jax.jit(jax.grad(loss_fn))(ps, xs)

    for a, b in zip(jax.tree_util.tree_leaves(g_single),
                    jax.tree_util.tree_leaves(g_sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_source_sharded_shortest_paths_match_replicated():
    """Sharding D's source axis across chips must not change distances."""
    from scipy import sparse
    from scipy.sparse.csgraph import dijkstra

    from vqvae_tpu.ops.shortest_paths import EdgeList, multi_source_shortest_paths

    rng = np.random.RandomState(0)
    n = 128
    rows = rng.randint(0, n, 600)
    cols = rng.randint(0, n, 600)
    keep = rows != cols
    W = sparse.csr_matrix((rng.rand(keep.sum()).astype(np.float32) + 0.1,
                           (rows[keep], cols[keep])), shape=(n, n))
    W = W.maximum(W.T)
    edges = EdgeList.from_csr(W, pad_multiple=256)
    sources = np.arange(16, dtype=np.int64)

    plain = np.asarray(multi_source_shortest_paths(edges, sources, chunk=256))

    mesh = get_mesh()
    d0 = jnp.full((n, 16), jnp.inf).at[jnp.asarray(sources),
                                       jnp.arange(16)].set(0.0)
    d0 = jax.device_put(d0, NamedSharding(mesh, P(None, "data")))
    sharded = np.asarray(multi_source_shortest_paths(edges, sources, d0=d0,
                                                     chunk=256))
    np.testing.assert_allclose(plain, sharded, rtol=1e-6)

    ref = dijkstra(W, directed=False, indices=sources).T
    np.testing.assert_allclose(plain, ref, rtol=1e-5, atol=1e-5)


def test_ell_source_sharded_matches():
    """The ELL engine's distance matrix also shards its source axis."""
    from scipy.sparse.csgraph import dijkstra

    from vqvae_tpu.ops import build_knn_graph
    from vqvae_tpu.ops.ell import BucketedGraph, multi_source_shortest_paths_ell

    rng = np.random.RandomState(1)
    z = rng.randn(150, 6).astype(np.float32)
    W, _ = build_knn_graph(z, k=5, sym="union")
    g = BucketedGraph.from_csr(W)
    sources = np.arange(16, dtype=np.int64)

    plain = np.asarray(multi_source_shortest_paths_ell(g, sources))

    mesh = get_mesh()
    d0 = jnp.full((150, 16), jnp.inf).at[jnp.asarray(sources),
                                         jnp.arange(16)].set(0.0)
    d0 = jax.device_put(d0, NamedSharding(mesh, P(None, "data")))
    sharded = np.asarray(multi_source_shortest_paths_ell(g, sources, d0=d0))
    np.testing.assert_allclose(plain, sharded, rtol=1e-6)
    ref = dijkstra(W, directed=False, indices=sources).T
    np.testing.assert_allclose(plain, ref, rtol=1e-5, atol=1e-4)


def test_run_on_cpu_matches_and_returns_host_values():
    """run_on_cpu computes identically to plain jit (on the CPU test mesh
    it takes the default-backend early return; on TPU it compiles locally
    instead of paying a minutes-long remote compile)."""
    from vqvae_tpu.parallel import run_on_cpu

    def fn(a, b):
        return {"s": a + b, "p": (a * b).sum()}

    a = jnp.arange(12.0).reshape(3, 4)
    b = jnp.ones((3, 4)) * 2.0
    out = run_on_cpu(fn, a, b)
    ref = jax.jit(fn)(a, b)
    np.testing.assert_allclose(np.asarray(out["s"]), np.asarray(ref["s"]))
    np.testing.assert_allclose(np.asarray(out["p"]), np.asarray(ref["p"]))
