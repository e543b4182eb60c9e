"""Fused nearest-code assignment as a Pallas TPU kernel.

Computes ``argmin_k ||z_i - c_k||^2`` for a batch of vectors against a
codebook without materializing the (N, K) distance matrix in HBM: each
query tile loads into VMEM, the distance block is produced on the MXU
(``z @ c^T`` with f32 accumulation) and immediately reduced to per-row
argmin/min on the VPU.

This one kernel backs three hot paths the reference computes as separate
blockwise torch/numpy matmuls:
- EMA VQ-VAE quantization (reference baseline vqvae.py:79-84),
- nearest-medoid assignment in the quality gates (reference
  evaluate_quantization_loss.py:37-50),
- Lloyd K-means assignment (reference demos via sklearn).

Falls back to a jitted XLA implementation off-TPU (interpret mode is used
in tests).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK_DIST = 3.4e38  # padded codes can never win the argmin


def _assign_kernel(k_valid_ref, z_ref, cb_ref, cb_sq_ref, idx_ref, dist_ref):
    z = z_ref[:]                      # (T, D) f32
    cb = cb_ref[:]                    # (K, D) f32
    dots = jax.lax.dot_general(
        z, cb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        # full f32 multiply passes: default MXU bf16 precision flips ~0.6%
        # of argmins on near-tied codes
        precision=jax.lax.Precision.HIGHEST)          # (T, K)
    d2 = cb_sq_ref[:] - 2.0 * dots                   # (T, K) (+|z|^2 const)
    k_ids = jax.lax.broadcasted_iota(jnp.int32, d2.shape, dimension=1)
    d2 = jnp.where(k_ids < k_valid_ref[0, 0], d2, _MASK_DIST)
    idx = jnp.argmin(d2, axis=1).astype(jnp.int32)
    best = jnp.min(d2, axis=1)
    z_sq = (z * z).sum(axis=1)
    idx_ref[:] = idx
    dist_ref[:] = jnp.maximum(best + z_sq, 0.0)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def _assign_device(z: jax.Array, cb: jax.Array, k_valid: jax.Array,
                   tile: int, interpret: bool) -> Tuple[jax.Array, jax.Array]:
    n, d = z.shape
    k = cb.shape[0]
    cb_sq = (cb * cb).sum(axis=1).reshape(1, k)
    n_tiles = n // tile
    k_valid_arr = jnp.asarray(k_valid, jnp.int32).reshape(1, 1)
    idx, dist = pl.pallas_call(
        _assign_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # 1-D blocks: the lane (last) dim is the tile, 128-divisible
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n,), jnp.int32),
            jax.ShapeDtypeStruct((n,), jnp.float32),
        ],
        interpret=interpret,
    )(k_valid_arr, z, cb, cb_sq)
    return idx, dist


def nearest_codes(
    z: np.ndarray | jax.Array,
    codebook: np.ndarray | jax.Array,
    tile: int = 1024,
    interpret: bool | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """(idx (N,), squared_dist (N,)) of the nearest codebook row per input.

    Shapes are padded to tile/lane multiples internally. ``interpret``
    defaults to True off-TPU so the same kernel runs everywhere.
    """
    z = np.asarray(z, np.float32)
    codebook = np.asarray(codebook, np.float32)
    n, d = z.shape
    k = codebook.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    d_pad = _round_up(max(d, 1), 128)
    k_pad = _round_up(max(k, 8), 128)
    # tile is the lane dim of the 1-D output blocks: 1-D arrays tile at
    # 1024 on TPU, so blocks must be 1024-multiples; cap the tile so the
    # kernel's live VMEM (z tile, distance block, double-buffering) stays
    # well under the ~16MB budget
    vmem_budget = 6 * 1024 * 1024
    tile_cap = max(1024, (vmem_budget // (4 * (k_pad + d_pad))) // 1024 * 1024)
    tile = max(1024, min(_round_up(tile, 1024), tile_cap))
    n_pad = _round_up(n, tile)

    z_p = np.zeros((n_pad, d_pad), np.float32)
    z_p[:n, :d] = z
    cb_p = np.zeros((k_pad, d_pad), np.float32)
    cb_p[:k, :d] = codebook

    idx, dist = _assign_device(jnp.asarray(z_p), jnp.asarray(cb_p),
                               jnp.int32(k), tile, interpret)
    return (np.asarray(idx[:n]).astype(np.int64),
            np.asarray(dist[:n]))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
