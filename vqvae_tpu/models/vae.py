"""Convolutional VAEs (flat-latent and spatial-grid) as one Flax module.

Re-designs the reference's two near-duplicate model classes (reference
src/models/vae.py:22-123 and src/models/spatial_vae.py:22-108) as a single
``VAE`` parameterized by ``topology``:

- ``topology="flat"``: conv trunk -> flatten -> dense mu/logvar of size
  ``latent_dim``; decoder is dense -> 4x4 grid -> deconv stack.
- ``topology="spatial"``: same trunk, but 1x1-conv heads emit a
  (4,4,latent_dim) grid of mu/logvar; decoder is 1x1 conv -> deconv stack.

Layout is NHWC (TPU-native); spatial latents are (B, 4, 4, C), the transpose
of the reference's (B, C, 4, 4). Spatial arithmetic matches the reference
exactly: three stride-2 convs take 28->14->7->4 or 32->16->8->4, and the
decoder's output paddings reproduce the 28-px output-padding trick
(reference src/models/spatial_vae.py:73 uses padding=3 on the last deconv).

Losses reproduce the reference ELBO semantics (reference
src/models/vae.py:131-197): sum-reduction divided by batch size, BCE-with-
logits or (optionally sigmoided) MSE recon, per-dim KL with optional
free-bits clamp, and capacity annealing in "abs" or "clipped" mode. The
spatial variant sums KL over (H, W, C) with no free-bits/capacity
(reference src/models/spatial_vae.py:110-125). Padded batch rows are
excluded via ``mask``.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def _norm(norm_type: str, dtype: Dtype):
    """Norm layer factory mirroring the reference's norm selection
    (reference src/models/vae.py:7-20): batch / group (<=32 groups dividing
    the channel count) / none."""
    norm_type = (norm_type or "none").lower()
    if norm_type == "batch":
        def make(ch, train):
            return nn.BatchNorm(use_running_average=not train, dtype=dtype,
                                param_dtype=jnp.float32)
        return make
    if norm_type == "group":
        def make(ch, train):
            groups = max(1, min(32, ch))
            while ch % groups != 0 and groups > 1:
                groups -= 1
            return nn.GroupNorm(num_groups=groups, dtype=dtype, param_dtype=jnp.float32)
        return make
    def make(ch, train):
        return lambda x: x
    return make


class Encoder(nn.Module):
    channels: Sequence[int] = (32, 64, 128)
    latent_dim: int = 16
    norm_type: str = "none"
    topology: str = "flat"  # "flat" | "spatial"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        norm = _norm(self.norm_type, self.dtype)
        h = x.astype(self.dtype)
        for ch in self.channels:
            # explicit (1,1) padding: flax "SAME" at stride 2 pads (0,1),
            # which shifts the sampling grid one pixel vs the reference's
            # torch padding=1 — explicit padding keeps checkpoint interop
            # and metric parity exact
            h = nn.Conv(ch, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)),
                        dtype=self.dtype, param_dtype=jnp.float32)(h)
            h = norm(ch, train)(h)
            h = nn.relu(h)
        if self.topology == "spatial":
            mu = nn.Conv(self.latent_dim, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32, name="head_mu")(h)
            logvar = nn.Conv(self.latent_dim, (1, 1), dtype=self.dtype,
                             param_dtype=jnp.float32, name="head_logvar")(h)
        else:
            h = h.reshape(h.shape[0], -1)
            mu = nn.Dense(self.latent_dim, dtype=self.dtype,
                          param_dtype=jnp.float32, name="head_mu")(h)
            logvar = nn.Dense(self.latent_dim, dtype=self.dtype,
                              param_dtype=jnp.float32, name="head_logvar")(h)
        return mu.astype(jnp.float32), logvar.astype(jnp.float32)


class Decoder(nn.Module):
    channels: Sequence[int] = (128, 64, 32)
    latent_dim: int = 16
    out_channels: int = 1
    output_image_size: int = 28
    norm_type: str = "none"
    topology: str = "flat"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array, train: bool = False) -> jax.Array:
        norm = _norm(self.norm_type, self.dtype)
        z = z.astype(self.dtype)
        if self.topology == "spatial":
            # z: (B, 4, 4, latent_dim) -> 1x1 conv into the deconv trunk
            h = nn.Conv(self.channels[0], (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="conv_in")(z)
        else:
            # z: (B, latent_dim) -> dense to a 4x4 grid
            h = nn.Dense(self.channels[0] * 16, dtype=self.dtype,
                         param_dtype=jnp.float32, name="fc_in")(z)
            h = h.reshape(h.shape[0], 4, 4, self.channels[0])

        # flax ConvTranspose explicit padding obeys
        #   out = (in-1)*stride + 2 - k + lo + hi,
        # so a torch ConvTranspose2d(k, stride=2, padding=p, output_padding=op)
        # corresponds to (lo, hi) = (k-1-p, k-1-p+op).
        if self.topology == "spatial":
            # 4->8->16->{28,32}: two k4s2p1 deconvs then a size-dependent head
            # (reference src/models/spatial_vae.py:58-78)
            stages = [((4, 4), (2, 2)), ((4, 4), (2, 2))]
            if self.output_image_size == 32:
                head = ((4, 4), (2, 2))  # torch p=1: 16 -> 32
            elif self.output_image_size == 28:
                head = ((4, 4), (0, 0))  # torch p=3: 16 -> 28
            else:
                raise ValueError(f"Unsupported output size: {self.output_image_size}")
        else:
            # 4->{7,8}->{14,16}->{28,32} (reference src/models/vae.py:60-80)
            op = 1 if self.output_image_size == 32 else 0
            stages = [((3, 3), (1, 1 + op)), ((4, 4), (2, 2))]
            head = ((4, 4), (2, 2))

        for ch, (kern, pad) in zip(self.channels[1:], stages):
            h = nn.ConvTranspose(ch, kern, strides=(2, 2), padding=(pad,) * 2,
                                 dtype=self.dtype, param_dtype=jnp.float32)(h)
            h = norm(ch, train)(h)
            h = nn.relu(h)
        kern, pad = head
        x_logits = nn.ConvTranspose(self.out_channels, kern, strides=(2, 2),
                                    padding=(pad,) * 2, dtype=self.dtype,
                                    param_dtype=jnp.float32, name="out")(h)
        return x_logits.astype(jnp.float32)


class VAE(nn.Module):
    """Unified conv VAE. ``topology`` selects flat vs spatial latents."""

    in_channels: int = 1
    enc_channels: Sequence[int] = (32, 64, 128)
    dec_channels: Sequence[int] = (128, 64, 32)
    latent_dim: int = 16
    recon_loss: str = "bce"  # "bce" | "mse"
    output_image_size: int = 28
    norm_type: str = "none"
    mse_use_sigmoid: bool = True
    topology: str = "flat"
    dtype: Dtype = jnp.float32
    # flat-topology regularization defaults (reference src/models/vae.py:96-100)
    free_bits: float = 0.5
    capacity_max: float = 15.0
    capacity_anneal_steps: int = 50_000
    capacity_mode: str = "abs"
    # spatial-topology opt-in anti-collapse clamp (reference parity = None;
    # the reference's spatial loss has no such lever and its CIFAR run
    # posterior-collapses — docs/runs/cifar10-spatial-geodesic-rootcause.md)
    spatial_free_bits: Optional[float] = None

    def setup(self):
        assert self.recon_loss in {"bce", "mse"}
        self.encoder = Encoder(self.enc_channels, self.latent_dim,
                               self.norm_type, self.topology, self.dtype)
        self.decoder = Decoder(self.dec_channels, self.latent_dim,
                               self.in_channels, self.output_image_size,
                               self.norm_type, self.topology, self.dtype)

    def encode(self, x, train: bool = False):
        return self.encoder(x, train)

    def decode(self, z, train: bool = False):
        return self.decoder(z, train)

    def __call__(self, x, rng: Optional[jax.Array] = None, train: bool = False):
        mu, logvar = self.encoder(x, train)
        if rng is not None:
            z = reparameterize(rng, mu, logvar)
        else:
            z = mu
        x_logits = self.decoder(z, train)
        return x_logits, mu, logvar, z

    @property
    def apply_sigmoid(self) -> bool:
        return self.recon_loss == "bce" or self.mse_use_sigmoid


def reparameterize(rng: jax.Array, mu: jax.Array, logvar: jax.Array) -> jax.Array:
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(rng, mu.shape, dtype=mu.dtype)
    return mu + eps * std


def decode_to_image(model: VAE, variables, z: jax.Array) -> jax.Array:
    """sigmoid(decoder(z)) flattened to (B, pixels) — the map whose Jacobian
    defines the pullback metric (reference src/geo/riemannian_metric.py:12-35).
    """
    logits = model.apply(variables, z, method=model.decode)
    img = jax.nn.sigmoid(logits)
    return img.reshape(img.shape[0], -1)


def elbo_loss(
    x: jax.Array,
    x_logits: jax.Array,
    mu: jax.Array,
    logvar: jax.Array,
    *,
    recon_loss: str,
    mse_use_sigmoid: bool,
    topology: str,
    beta: float,
    mask: Optional[jax.Array] = None,
    free_bits: Optional[float] = None,
    capacity_max: float = 0.0,
    capacity_anneal_steps: int = 0,
    capacity_mode: str = "abs",
    step: int | jax.Array = 0,
    spatial_free_bits: Optional[float] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """ELBO with the reference's exact reduction semantics.

    Returns (total, recon, kl) scalars. ``mask`` (B,) excludes padded rows;
    all sums are divided by the effective batch size (mask.sum()).
    """
    b = x.shape[0]
    if mask is None:
        mask = jnp.ones((b,), jnp.float32)
    denom = jnp.maximum(mask.sum(), 1.0)

    axes = tuple(range(1, x.ndim))
    if recon_loss == "bce":
        # numerically-stable BCE-with-logits, summed per sample
        l = x_logits
        per = jnp.maximum(l, 0) - l * x + jnp.log1p(jnp.exp(-jnp.abs(l)))
        recon = (per.sum(axes) * mask).sum() / denom
    else:
        pred = jax.nn.sigmoid(x_logits) if mse_use_sigmoid else x_logits
        recon = (((pred - x) ** 2).sum(axes) * mask).sum() / denom

    kl_per = -0.5 * (1.0 + logvar - mu**2 - jnp.exp(logvar))
    if topology == "flat" and free_bits is not None:
        kl_per = jnp.maximum(kl_per, free_bits)
    elif topology == "spatial" and spatial_free_bits is not None:
        # NOT in the reference (its spatial loss has no anti-collapse
        # lever, spatial_vae.py:110-125, and its CIFAR spatial run shows
        # it — see docs/runs/cifar10-spatial-geodesic-rootcause.md).
        # Opt-in per-dim free-bits clamp; None (default) = parity.
        kl_per = jnp.maximum(kl_per, spatial_free_bits)
    kl_axes = tuple(range(1, mu.ndim))
    kl = (kl_per.sum(kl_axes) * mask).sum() / denom

    if topology == "flat" and capacity_max > 0 and capacity_anneal_steps > 0:
        progress = jnp.minimum(1.0, step / max(1, capacity_anneal_steps))
        target = capacity_max * progress
        if capacity_mode == "abs":
            kl_reg = jnp.abs(kl - target)
        else:  # "clipped"
            kl_reg = jnp.maximum(kl - target, 0.0)
        total = recon + beta * kl_reg
    else:
        total = recon + beta * kl

    return total, recon, kl
