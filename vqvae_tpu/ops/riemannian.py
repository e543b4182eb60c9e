"""Decoder-pullback Riemannian edge lengths via jax.jvp.

Parity target: reference src/geo/riemannian_metric.py:12-66 —
L_ij ~= 0.5 * (||J(z_i) dz|| + ||J(z_j) dz||) where J is the Jacobian of
z -> sigmoid(decoder(z)) flattened to pixels, and dz = z_j - z_i.

The torch implementation calls ``torch.autograd.functional.jvp`` per
512-edge batch (riemannian_metric.py:32-34, two decoder JVPs each); here
the whole batched computation — both endpoint JVPs — is a single jitted
``lax.map`` over fixed-size chunks of the edge list, so the decoder's
linearization runs fully fused on the MXU. For spatial decoders, each
latent vector is decoded as a 1x1 spatial grid exactly like the reference
(riemannian_metric.py:24-27: 2-D z is unsqueezed to (B, C, 1, 1)).
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def make_decoder_image_fn(model, variables, topology: str) -> Callable:
    """Build z -> flattened sigmoid(decoder(z)) for the given VAE.

    ``topology="flat"``: z (B, D) feeds the dense decoder directly.
    ``topology="spatial"``: z (B, C) is decoded as a (B, 1, 1, C) grid
    (NHWC transpose of the reference's (B, C, 1, 1)).
    """
    def decode_fn(z):
        if topology == "spatial" and z.ndim == 2:
            z = z[:, None, None, :]
        logits = model.apply(variables, z, method=model.decode)
        img = jax.nn.sigmoid(logits)
        return img.reshape(img.shape[0], -1)

    return decode_fn


@functools.partial(jax.jit, static_argnames=("decode_fn",))
def _batched_lengths(decode_fn, z_start_chunks, z_end_chunks):
    def one_chunk(args):
        za, zb = args
        v = zb - za
        _, jvp_a = jax.jvp(decode_fn, (za,), (v,))
        _, jvp_b = jax.jvp(decode_fn, (zb,), (v,))
        na = jnp.linalg.norm(jvp_a.astype(jnp.float32), axis=1)
        nb = jnp.linalg.norm(jvp_b.astype(jnp.float32), axis=1)
        return 0.5 * (na + nb)

    return jax.lax.map(one_chunk, (z_start_chunks, z_end_chunks))


def edge_lengths_riemannian(
    decode_fn: Callable,
    z_start: np.ndarray,
    z_end: np.ndarray,
    batch_size: int = 512,
) -> np.ndarray:
    """Riemannian lengths for E edges; returns (E,) float32.

    ``decode_fn`` maps a latent batch to flattened [0,1] images (see
    ``make_decoder_image_fn``). Edges are processed in fixed ``batch_size``
    chunks (padded) under one jit.
    """
    z_start = np.asarray(z_start, np.float32)
    z_end = np.asarray(z_end, np.float32)
    if z_start.shape != z_end.shape:
        raise ValueError("Start and end points must have same shape")
    e = z_start.shape[0]
    if e == 0:
        return np.empty((0,), np.float32)
    bs = min(batch_size, e)
    e_pad = ((e + bs - 1) // bs) * bs
    if e_pad > e:
        pad = np.zeros((e_pad - e, *z_start.shape[1:]), np.float32)
        z_start = np.concatenate([z_start, pad])
        z_end = np.concatenate([z_end, pad])
    n_chunks = e_pad // bs
    za = jnp.asarray(z_start).reshape(n_chunks, bs, *z_start.shape[1:])
    zb = jnp.asarray(z_end).reshape(n_chunks, bs, *z_end.shape[1:])
    out = _batched_lengths(decode_fn, za, zb)
    return np.asarray(out).reshape(e_pad)[:e].astype(np.float32)
