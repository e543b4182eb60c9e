"""Riemannian metric tests with an analytic linear decoder
(reference tests/test_riemannian_metric.py uses the same DummyDec trick:
for a linear map z -> sigmoid(Wz), the JVP is diag(s(1-s)) W v)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_tpu.ops import edge_lengths_riemannian


@pytest.fixture
def linear_decode_fn():
    rng = np.random.RandomState(0)
    W = jnp.asarray(rng.randn(6, 4).astype(np.float32))

    def decode(z):  # (B, 4) -> (B, 6), sigmoid like the image map
        return jax.nn.sigmoid(z @ W.T)

    return decode, np.asarray(W)


def _analytic_length(W, za, zb):
    v = zb - za
    def jvp_at(z):
        s = 1.0 / (1.0 + np.exp(-(z @ W.T)))
        return (s * (1 - s)) * (v @ W.T)
    return 0.5 * (np.linalg.norm(jvp_at(za), axis=1)
                  + np.linalg.norm(jvp_at(zb), axis=1))


def test_shapes_and_nonnegativity(linear_decode_fn):
    decode, _ = linear_decode_fn
    rng = np.random.RandomState(1)
    za = rng.randn(37, 4).astype(np.float32)
    zb = rng.randn(37, 4).astype(np.float32)
    lengths = edge_lengths_riemannian(decode, za, zb, batch_size=16)
    assert lengths.shape == (37,)
    assert (lengths >= 0).all()


def test_matches_analytic_jacobian(linear_decode_fn):
    decode, W = linear_decode_fn
    rng = np.random.RandomState(2)
    za = rng.randn(20, 4).astype(np.float32)
    zb = rng.randn(20, 4).astype(np.float32)
    ours = edge_lengths_riemannian(decode, za, zb, batch_size=8)
    ref = _analytic_length(W, za, zb)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_symmetric_under_swap(linear_decode_fn):
    decode, _ = linear_decode_fn
    rng = np.random.RandomState(3)
    za = rng.randn(10, 4).astype(np.float32)
    zb = rng.randn(10, 4).astype(np.float32)
    ab = edge_lengths_riemannian(decode, za, zb)
    ba = edge_lengths_riemannian(decode, zb, za)
    np.testing.assert_allclose(ab, ba, rtol=1e-5)


def test_linear_scaling_with_step(linear_decode_fn):
    decode, _ = linear_decode_fn
    rng = np.random.RandomState(4)
    za = rng.randn(8, 4).astype(np.float32)
    v = rng.randn(8, 4).astype(np.float32) * 0.01
    l1 = edge_lengths_riemannian(decode, za, za + v)
    l2 = edge_lengths_riemannian(decode, za, za + 2 * v)
    np.testing.assert_allclose(l2 / np.maximum(l1, 1e-12), 2.0, rtol=0.05)


def test_batch_size_invariance(linear_decode_fn):
    decode, _ = linear_decode_fn
    rng = np.random.RandomState(5)
    za = rng.randn(33, 4).astype(np.float32)  # ragged final batch
    zb = rng.randn(33, 4).astype(np.float32)
    a = edge_lengths_riemannian(decode, za, zb, batch_size=8)
    b = edge_lengths_riemannian(decode, za, zb, batch_size=33)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_spatial_decoder_1x1_grid():
    """Spatial topology: latents decode as a (B,1,1,C) grid like the
    reference (riemannian_metric.py:24-27)."""
    from vqvae_tpu.models import VAE
    from vqvae_tpu.ops.riemannian import make_decoder_image_fn

    m = VAE(in_channels=1, latent_dim=8, topology="spatial",
            output_image_size=28, norm_type="none",
            enc_channels=(8, 16, 32), dec_channels=(32, 16, 8))
    x = jnp.zeros((1, 28, 28, 1))
    variables = m.init({"params": jax.random.key(0)}, x)
    decode_fn = make_decoder_image_fn(m, variables, "spatial")
    rng = np.random.RandomState(6)
    za = rng.randn(9, 8).astype(np.float32)
    zb = rng.randn(9, 8).astype(np.float32)
    lengths = edge_lengths_riemannian(decode_fn, za, zb, batch_size=4)
    assert lengths.shape == (9,)
    assert np.isfinite(lengths).all()


def test_nodal_matches_edgewise(linear_decode_fn):
    """edge_lengths_riemannian_nodal (per-node pullback metrics) computes
    the identical quantity as the 2-JVPs-per-edge path."""
    from vqvae_tpu.ops.riemannian import edge_lengths_riemannian_nodal

    decode, W = linear_decode_fn
    rng = np.random.RandomState(8)
    z = rng.randn(50, 4).astype(np.float32)
    rows = rng.randint(0, 50, size=200)
    cols = rng.randint(0, 50, size=200)
    nodal = edge_lengths_riemannian_nodal(decode, z, rows, cols,
                                          batch_size=16, edge_block=64)
    edgewise = edge_lengths_riemannian(decode, z[rows], z[cols],
                                       batch_size=32)
    np.testing.assert_allclose(nodal, edgewise, rtol=1e-4, atol=1e-5)
    ref = _analytic_length(W, z[rows], z[cols])
    np.testing.assert_allclose(nodal, ref, rtol=1e-4, atol=1e-5)


def test_nodal_spatial_decoder():
    from vqvae_tpu.models import VAE
    from vqvae_tpu.ops.riemannian import (edge_lengths_riemannian_nodal,
                                          make_decoder_image_fn)

    m = VAE(in_channels=1, latent_dim=8, topology="spatial",
            output_image_size=28, norm_type="none",
            enc_channels=(8, 16, 32), dec_channels=(32, 16, 8))
    x = jnp.zeros((1, 28, 28, 1))
    variables = m.init({"params": jax.random.key(0)}, x)
    decode_fn = make_decoder_image_fn(m, variables, "spatial")
    rng = np.random.RandomState(9)
    z = rng.randn(12, 8).astype(np.float32)
    rows = rng.randint(0, 12, size=30)
    cols = rng.randint(0, 12, size=30)
    nodal = edge_lengths_riemannian_nodal(decode_fn, z, rows, cols,
                                          batch_size=4)
    edgewise = edge_lengths_riemannian(decode_fn, z[rows], z[cols],
                                       batch_size=8)
    np.testing.assert_allclose(nodal, edgewise, rtol=1e-3, atol=1e-5)


def test_auto_dispatch_env_override(linear_decode_fn, monkeypatch):
    """auto -> edgewise by default (measured verdict, docs/benchmarks.md);
    VQVAE_TPU_RIEMANNIAN=nodal forces the nodal engine. Both exact."""
    from vqvae_tpu.ops.riemannian import edge_lengths_riemannian_auto

    decode, W = linear_decode_fn
    rng = np.random.RandomState(10)
    z = rng.randn(40, 4).astype(np.float32)
    rows = rng.randint(0, 40, size=120)
    cols = rng.randint(0, 40, size=120)
    ref = _analytic_length(W, z[rows], z[cols])
    default = edge_lengths_riemannian_auto(decode, z, rows, cols,
                                           batch_size=32)
    np.testing.assert_allclose(default, ref, rtol=1e-4, atol=1e-5)
    monkeypatch.setenv("VQVAE_TPU_RIEMANNIAN", "nodal")
    nodal = edge_lengths_riemannian_auto(decode, z, rows, cols,
                                         batch_size=32)
    np.testing.assert_allclose(nodal, ref, rtol=1e-4, atol=1e-5)


def test_sharded_rank3_spatial_latents():
    """ADVICE r3: the shard_map spec must follow the latent rank — spatial
    (rank>2) latents on a >1-device mesh used to hit a specs/rank mismatch
    while the unsharded path worked."""
    from vqvae_tpu.parallel import get_mesh

    rng = np.random.RandomState(3)
    W = jnp.asarray(rng.randn(8, 2 * 2 * 3).astype(np.float32))

    def decode(z):  # (B, 2, 2, 3) spatial latents -> (B, 8)
        return jax.nn.sigmoid(z.reshape(z.shape[0], -1) @ W.T)

    za = rng.randn(48, 2, 2, 3).astype(np.float32)
    zb = rng.randn(48, 2, 2, 3).astype(np.float32)
    ref = edge_lengths_riemannian(decode, za, zb, batch_size=8)
    sharded = edge_lengths_riemannian(decode, za, zb, batch_size=8,
                                      mesh=get_mesh(8))
    np.testing.assert_allclose(sharded, ref, rtol=1e-5, atol=1e-6)


# ---- linearized (MLP) spatial decoder engine --------------------------------

def _spatial_vae(norm="batch", out_size=28, dec=(16, 12, 8), lat=4):
    from vqvae_tpu.models import VAE

    model = VAE(in_channels=1, latent_dim=lat, topology="spatial",
                output_image_size=out_size, norm_type=norm, recon_loss="mse",
                enc_channels=(8, 12, 16), dec_channels=dec)
    variables = model.init({"params": jax.random.key(0)},
                           np.zeros((1, out_size, out_size, 1), np.float32))
    # randomize batch_stats + norm affine so batch norm is not a no-op
    rng = np.random.RandomState(7)
    variables = jax.tree_util.tree_map(
        lambda x: jnp.asarray(rng.uniform(0.2, 1.5, x.shape)
                              .astype(np.float32)) if x.ndim == 1 else x,
        variables)
    return model, variables


@pytest.mark.parametrize("norm,out_size", [("batch", 28), ("none", 28),
                                           ("batch", 32)])
def test_mlp_decode_matches_conv_decode(norm, out_size):
    """The probed affine-segment decoder is the SAME map as the conv
    decoder on 1x1 latent grids (float association aside)."""
    from vqvae_tpu.ops import build_mlp_decode_fn
    from vqvae_tpu.ops.riemannian import make_decoder_image_fn

    model, variables = _spatial_vae(norm=norm, out_size=out_size)
    conv_fn = make_decoder_image_fn(model, variables, "spatial")
    mlp_fn = build_mlp_decode_fn(model, variables)
    assert mlp_fn is not None
    z = np.random.RandomState(1).randn(33, 4).astype(np.float32)
    ref = np.asarray(conv_fn(jnp.asarray(z)))
    got = np.asarray(mlp_fn(jnp.asarray(z)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_mlp_unsupported_configs():
    from vqvae_tpu.models import VAE
    from vqvae_tpu.ops import build_mlp_decode_fn

    model, variables = _spatial_vae(norm="group")
    assert build_mlp_decode_fn(model, variables) is None
    flat = VAE(in_channels=1, latent_dim=4, topology="flat",
               output_image_size=28, enc_channels=(8, 12, 16),
               dec_channels=(16, 12, 8))
    fvars = flat.init({"params": jax.random.key(0)},
                      np.zeros((1, 28, 28, 1), np.float32))
    assert build_mlp_decode_fn(flat, fvars) is None


def test_auto_engine_mlp_matches_edgewise(monkeypatch):
    """auto routes spatial decoders through the linearized engine; the
    lengths must match the forced conv edgewise path."""
    from vqvae_tpu.ops import edge_lengths_riemannian_auto
    from vqvae_tpu.ops.riemannian import RIEM_STATS, make_decoder_image_fn

    model, variables = _spatial_vae()
    decode_fn = make_decoder_image_fn(model, variables, "spatial")
    rng = np.random.RandomState(2)
    z = rng.randn(60, 4).astype(np.float32)
    rows = rng.randint(0, 60, size=200)
    cols = rng.randint(0, 60, size=200)
    monkeypatch.setenv("VQVAE_TPU_RIEM_STATS", "1")
    n0 = len(RIEM_STATS)
    auto = edge_lengths_riemannian_auto(decode_fn, z, rows, cols,
                                        batch_size=64)
    monkeypatch.setenv("VQVAE_TPU_RIEMANNIAN", "edgewise")
    edge = edge_lengths_riemannian_auto(decode_fn, z, rows, cols,
                                        batch_size=64)
    np.testing.assert_allclose(auto, edge, rtol=1e-4, atol=1e-5)
    stats = RIEM_STATS[n0:]
    assert [s["engine"] for s in stats] == ["mlp", "edgewise"]
    assert all(s["samples"] == 400 for s in stats)
    assert all(s["jvp_flops_per_sample"] and s["jvp_flops_per_sample"] > 0
               for s in stats)
    # the linearized engine needs strictly fewer FLOPs than the conv path
    assert stats[0]["jvp_flops_per_sample"] < stats[1]["jvp_flops_per_sample"]


def test_mlp_self_check_rejects_drifted_probe(monkeypatch):
    """If the affine-segment probe ever disagrees with the real conv
    decoder (model-geometry drift), build_mlp_decode_fn must return None
    so auto falls back to the always-correct conv path."""
    from vqvae_tpu.ops import build_mlp_decode_fn
    from vqvae_tpu.ops import riemannian as riem

    model, variables = _spatial_vae()
    good = riem._decoder_affine_segments(model, variables)
    assert good is not None
    corrupted = [(M * 1.5, c) for M, c in good]  # wrong map, right shapes
    monkeypatch.setattr(riem, "_decoder_affine_segments",
                        lambda *a, **k: corrupted)
    assert build_mlp_decode_fn(model, variables) is None


def test_engine_mlp_forced_raises_when_unsupported(monkeypatch):
    from vqvae_tpu.ops import edge_lengths_riemannian_auto
    from vqvae_tpu.ops.riemannian import make_decoder_image_fn

    model, variables = _spatial_vae(norm="group")
    decode_fn = make_decoder_image_fn(model, variables, "spatial")
    z = np.random.RandomState(3).randn(10, 4).astype(np.float32)
    monkeypatch.setenv("VQVAE_TPU_RIEMANNIAN", "mlp")
    with pytest.raises(ValueError, match="cannot be linearized"):
        edge_lengths_riemannian_auto(decode_fn, z, np.arange(5),
                                     np.arange(5, 10), batch_size=8)
    # auto falls back to edgewise silently
    monkeypatch.setenv("VQVAE_TPU_RIEMANNIAN", "auto")
    out = edge_lengths_riemannian_auto(decode_fn, z, np.arange(5),
                                       np.arange(5, 10), batch_size=8)
    assert out.shape == (5,)


def test_indexed_matches_preformed(linear_decode_fn):
    """Device-side endpoint gathers are exactly the preformed-endpoint
    computation, sharded or not."""
    from vqvae_tpu.ops import (edge_lengths_riemannian,
                               edge_lengths_riemannian_indexed)
    from vqvae_tpu.parallel import get_mesh

    decode, _ = linear_decode_fn
    rng = np.random.RandomState(4)
    z = rng.randn(50, 4).astype(np.float32)
    rows = rng.randint(0, 50, size=170)
    cols = rng.randint(0, 50, size=170)
    ref = edge_lengths_riemannian(decode, z[rows], z[cols], batch_size=32)
    got = edge_lengths_riemannian_indexed(decode, z, rows, cols,
                                          batch_size=32)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-7)
    sharded = edge_lengths_riemannian_indexed(decode, z, rows, cols,
                                              batch_size=32,
                                              mesh=get_mesh(8))
    np.testing.assert_allclose(sharded, ref, rtol=1e-5, atol=1e-7)


def test_conv_flops_accounting():
    from vqvae_tpu.ops.riemannian import conv_decoder_jvp_flops_per_sample

    model, _ = _spatial_vae(dec=(16, 12, 8), lat=4)
    # 1x1 conv_in: 4*16; ct1 (out 2x2): 4*16*16*12; ct2 (out 4x4):
    # 16*16*12*8; head 28px (out 4x4): 16*16*8*1 — x4 (FLOPs + tangent)
    macs = 4 * 16 + 4 * 16 * 16 * 12 + 16 * 16 * 12 * 8 + 16 * 16 * 8
    assert conv_decoder_jvp_flops_per_sample(model) == 4.0 * macs
