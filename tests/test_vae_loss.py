"""ELBO semantics tests, incl. the spatial free-bits anti-collapse knob.

The reference's spatial loss has no free-bits/capacity lever (reference
spatial_vae.py:110-125) and its CIFAR recipe posterior-collapses
(docs/runs/cifar10-spatial-geodesic-rootcause.md); ``spatial_free_bits``
is this framework's opt-in clamp — None must stay bit-identical to the
reference semantics.
"""
import jax.numpy as jnp
import numpy as np

from vqvae_tpu.models.vae import elbo_loss


def _inputs(topology, seed=0):
    rng = np.random.RandomState(seed)
    b = 4
    x = rng.rand(b, 8, 8, 1).astype(np.float32)
    logits = rng.randn(b, 8, 8, 1).astype(np.float32)
    if topology == "spatial":
        mu = rng.randn(b, 2, 2, 3).astype(np.float32)
        lv = rng.randn(b, 2, 2, 3).astype(np.float32) * 0.1
    else:
        mu = rng.randn(b, 6).astype(np.float32)
        lv = rng.randn(b, 6).astype(np.float32) * 0.1
    return x, logits, mu, lv


def test_spatial_free_bits_none_is_reference_parity():
    x, logits, mu, lv = _inputs("spatial")
    base = elbo_loss(x, logits, mu, lv, recon_loss="mse",
                     mse_use_sigmoid=False, topology="spatial", beta=1.0)
    same = elbo_loss(x, logits, mu, lv, recon_loss="mse",
                     mse_use_sigmoid=False, topology="spatial", beta=1.0,
                     spatial_free_bits=None)
    for a, b in zip(base, same):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_spatial_free_bits_floors_collapsed_kl():
    """A collapsed posterior (mu=0, logvar=0 -> KL=0) must pay the floor:
    kl == spatial_free_bits * n_latent_dims, giving the optimizer no
    gradient toward collapse below the floor."""
    x, logits, _, _ = _inputs("spatial")
    mu = jnp.zeros((4, 2, 2, 3), jnp.float32)
    lv = jnp.zeros((4, 2, 2, 3), jnp.float32)
    sfb = 0.1
    _, _, kl = elbo_loss(x, logits, mu, lv, recon_loss="mse",
                         mse_use_sigmoid=False, topology="spatial",
                         beta=1.0, spatial_free_bits=sfb)
    np.testing.assert_allclose(float(kl), sfb * 2 * 2 * 3, rtol=1e-6)


def test_spatial_free_bits_inactive_above_floor():
    """Per-dim KLs already above the floor are untouched."""
    x, logits, _, _ = _inputs("spatial")
    mu = jnp.full((4, 2, 2, 3), 3.0, jnp.float32)  # KL/dim = 4.5 >> 0.1
    lv = jnp.zeros((4, 2, 2, 3), jnp.float32)
    base = elbo_loss(x, logits, mu, lv, recon_loss="mse",
                     mse_use_sigmoid=False, topology="spatial", beta=1.0)
    clamped = elbo_loss(x, logits, mu, lv, recon_loss="mse",
                        mse_use_sigmoid=False, topology="spatial", beta=1.0,
                        spatial_free_bits=0.1)
    np.testing.assert_allclose(float(base[2]), float(clamped[2]), rtol=1e-6)


def test_flat_free_bits_unchanged():
    x, logits, mu, lv = _inputs("flat")
    _, _, kl_clamped = elbo_loss(x, logits, mu, lv, recon_loss="mse",
                                 mse_use_sigmoid=True, topology="flat",
                                 beta=1.0, free_bits=10.0)
    # every per-dim KL is below 10 nats here, so the clamp binds everywhere
    np.testing.assert_allclose(float(kl_clamped), 10.0 * 6, rtol=1e-6)
