"""End-to-end EMA VQ-VAE baseline (the reference's comparison target).

Re-designs the reference baseline (reference baseline VQVAE/
vqvae_cifar10_clean/models/vqvae.py:6-158) the JAX way: the ResNet
encoder/decoder are a Flax module, while the EMA codebook is **pure
functional state** (a ``CodebookState`` pytree threaded through the train
step) instead of mutated registered buffers — EMA updates, Laplace
smoothing, NaN/clamp guards, straight-through estimation and dead-code
reseeding are all pure functions, so the whole train step jits and shards
data-parallel.

Encoder: 32->16->8 stride-2 stem, n_res ResBlocks, 1x1 out conv -> z_e of
``z_channels``. Decoder mirrors it with a Tanh head in [-1, 1].
"""
from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class ResBlock(nn.Module):
    ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.ch, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32)(h)
        h = nn.relu(h)
        h = nn.Conv(self.ch, (1, 1), dtype=self.dtype, param_dtype=jnp.float32)(h)
        return x + h


class VQEncoder(nn.Module):
    hidden: int = 256
    z_channels: int = 128
    n_res: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.hidden // 2, (4, 4), strides=(2, 2),
                    padding=((1, 1), (1, 1)),
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        h = nn.relu(h)
        h = nn.Conv(self.hidden, (4, 4), strides=(2, 2),
                    padding=((1, 1), (1, 1)),
                    dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = nn.relu(h)
        h = nn.Conv(self.z_channels, (3, 3), padding="SAME",
                    dtype=self.dtype, param_dtype=jnp.float32)(h)
        for _ in range(self.n_res):
            h = ResBlock(self.z_channels, self.dtype)(h)
        return nn.Conv(self.z_channels, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32)(h)


class VQDecoder(nn.Module):
    out_channels: int = 3
    hidden: int = 256
    z_channels: int = 128
    n_res: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z_q):
        h = nn.Conv(self.z_channels, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32)(z_q)
        for _ in range(self.n_res):
            h = ResBlock(self.z_channels, self.dtype)(h)
        h = nn.relu(h)
        h = nn.ConvTranspose(self.hidden, (4, 4), strides=(2, 2),
                             padding=((2, 2), (2, 2)), dtype=self.dtype,
                             param_dtype=jnp.float32)(h)
        h = nn.relu(h)
        h = nn.ConvTranspose(self.hidden // 2, (4, 4), strides=(2, 2),
                             padding=((2, 2), (2, 2)), dtype=self.dtype,
                             param_dtype=jnp.float32)(h)
        h = nn.relu(h)
        h = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32)(h)
        return jnp.tanh(h.astype(jnp.float32))


class VQVAE(nn.Module):
    """Encoder/decoder pair; quantization happens outside via CodebookState."""

    in_channels: int = 3
    z_channels: int = 128
    hidden: int = 256
    n_res_blocks: int = 2
    dtype: Dtype = jnp.float32

    def setup(self):
        self.enc = VQEncoder(self.hidden, self.z_channels, self.n_res_blocks, self.dtype)
        self.dec = VQDecoder(self.in_channels, self.hidden, self.z_channels,
                             self.n_res_blocks, self.dtype)

    def encode(self, x):
        return self.enc(x)

    def decode(self, z_q):
        return self.dec(z_q)

    def __call__(self, x):
        # quantization-free passthrough (used for init/tracing)
        return self.dec(self.enc(x))


class CodebookState(NamedTuple):
    """EMA codebook state (pure pytree): mirrors the reference's registered
    buffers embed / cluster_size / embed_avg (reference vqvae.py:62-66)."""

    embed: jax.Array        # (K, C)
    cluster_size: jax.Array  # (K,)
    embed_avg: jax.Array    # (K, C)

    @staticmethod
    def create(rng: jax.Array, n_codes: int, code_dim: int) -> "CodebookState":
        embed = jax.random.normal(rng, (n_codes, code_dim), jnp.float32)
        # embed_avg must be a DISTINCT buffer: aliasing it to embed makes a
        # donated CodebookState donate one buffer twice (XLA rejects it)
        return CodebookState(embed=embed,
                             cluster_size=jnp.zeros((n_codes,), jnp.float32),
                             embed_avg=embed.copy())


def quantize(cb: CodebookState, z_e: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Nearest-code lookup. z_e (B,H,W,C) -> (z_q (B,H,W,C), idx (B,H,W))."""
    B, H, W, C = z_e.shape
    flat = z_e.reshape(-1, C).astype(jnp.float32)
    e = cb.embed
    # ||x - e||^2 = x^2 - 2xe + e^2 ; argmin over codes on the MXU
    d = ((flat**2).sum(1, keepdims=True)
         - 2.0 * flat @ e.T
         + (e**2).sum(1))
    idx = jnp.argmin(d, axis=1)
    z_q = e[idx].reshape(B, H, W, C)
    return z_q, idx.reshape(B, H, W)


def ema_update(cb: CodebookState, z_e: jax.Array, idx: jax.Array,
               decay: float = 0.99, eps: float = 1e-5) -> CodebookState:
    """One EMA codebook update with Laplace smoothing and numeric guards
    (reference vqvae.py:85-107)."""
    n_codes, code_dim = cb.embed.shape
    flat = z_e.reshape(-1, code_dim).astype(jnp.float32)
    flat_idx = idx.reshape(-1)
    one_hot = jax.nn.one_hot(flat_idx, n_codes, dtype=jnp.float32)

    counts = one_hot.sum(0)
    embed_sum = one_hot.T @ flat  # (K, C) on the MXU

    cluster_size = cb.cluster_size * decay + counts * (1.0 - decay)
    embed_avg = cb.embed_avg * decay + embed_sum * (1.0 - decay)

    n = cluster_size.sum()
    smoothed = (cluster_size + eps) / (n + n_codes * eps) * n
    denom = jnp.maximum(smoothed, eps)[:, None]
    embed = embed_avg / denom
    embed = jnp.nan_to_num(embed, nan=0.0, posinf=1.0, neginf=-1.0)
    embed = jnp.clip(embed, -2.0, 2.0)
    return CodebookState(embed=embed, cluster_size=cluster_size, embed_avg=embed_avg)


def straight_through(z_e: jax.Array, z_q: jax.Array) -> jax.Array:
    return z_e + jax.lax.stop_gradient(z_q - z_e)


def commitment_loss(z_e: jax.Array, z_q: jax.Array, beta: float = 0.25) -> jax.Array:
    """beta * mse(stop_grad(z_q), z_e) (reference vqvae.py:112-114)."""
    return beta * jnp.mean((jax.lax.stop_gradient(z_q) - z_e.astype(jnp.float32)) ** 2)


def reseed_dead_codes(rng: jax.Array, cb: CodebookState, sample_bank: jax.Array,
                      min_count: float = 5.0) -> Tuple[CodebookState, jax.Array]:
    """Replace codes with EMA count < min_count by random latents from the
    bank (reference vqvae.py:117-143), as a pure jittable update.

    Returns (new state, number of codes reseeded).
    """
    n_codes, code_dim = cb.embed.shape
    n_bank = sample_bank.shape[0]
    if sample_bank.shape[-1] != code_dim or n_bank == 0:
        return cb, jnp.zeros((), jnp.int32)
    dead = cb.cluster_size < min_count
    picks = jax.random.randint(rng, (n_codes,), 0, n_bank)
    new_vecs = sample_bank[picks].astype(jnp.float32)
    embed = jnp.where(dead[:, None], new_vecs, cb.embed)
    embed_avg = jnp.where(dead[:, None], new_vecs, cb.embed_avg)
    cluster_size = jnp.where(dead, min_count, cb.cluster_size)
    return (CodebookState(embed, cluster_size, embed_avg),
            dead.sum().astype(jnp.int32))


def perplexity(idx: jax.Array, n_codes: int) -> jax.Array:
    hist = jnp.bincount(idx.reshape(-1), length=n_codes).astype(jnp.float32)
    p = hist / jnp.maximum(hist.sum(), 1.0)
    ent = -(p * jnp.log(jnp.maximum(p, 1e-12))).sum()
    return jnp.exp(ent)
