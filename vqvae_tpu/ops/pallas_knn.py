"""Fused kNN candidate selection as a single Pallas TPU kernel.

The XLA block kernel in ops/knn.py materializes each (query_tile, db_tile)
distance tile in HBM before selecting candidates: at the 983k north-star
shape that distance stream is ~3.9 TB of HBM round-trips per pass, which is
what caps the measured 13-19s stage (docs/benchmarks.md "selection floor").
This kernel never leaves VMEM between the matmul and the selection:

- **Augmented matmul**: squared distances are ONE dot product,
  ``d = [-2q; |q|^2; 1]^T @ [x; 1; |x|^2]`` (cosine: ``[-q; 1]^T [x; 1]``),
  computed on the MXU straight into VMEM. Inputs are pre-transposed to
  (D_aug, N) so every Pallas block is lane-aligned without padding the
  feature dim to 128 (db stream traffic stays N^2*D*4/T, ~0.5 TB at 983k).
- **Binned top-2 accumulators**: candidate slot = db row index mod ``bins``;
  each slot keeps the two smallest distances seen (VMEM scratch, persists
  across the db-tile grid axis). A true neighbor is lost only when >=2
  closer neighbors share its bin: expected misses ~ k*C(k-1,2)/bins^2,
  <2e-4 per neighbor at k=22, bins=1024 — far inside the kNN stage's
  >=0.999 candidate-recall contract (empirical: tests/test_pallas_knn.py).
- **In-kernel extraction**: after the last db tile, the k+margin smallest
  accumulator entries are peeled off by iterative min-extraction, so the
  kernel emits only (N, 128) candidate slots — the (N, 2*bins) accumulator
  never reaches HBM either.
- **Packed keys** (``packed=True``): distance and origin-block id share one
  i32 key — ``(bits(max(d,0)) & ~(2^b-1)) | block_id`` — so the top-2
  update runs on TWO i32 accumulators instead of four f32/i32 pairs
  (2 compares + 3 selects per element vs 2 + 6 plus per-sub-block iota
  rebuilds, and half the VMEM scratch). Non-negative f32 bit patterns are
  order-isomorphic to i32, so one integer min orders by distance with the
  block id as a deterministic tie-break. ``b = ceil(log2(N/bins))`` mantissa
  bits are truncated (10 at the 983k/1024-bin north star, leaving 13 —
  still finer than the bf16 multiply passes that feed the selection); the
  exact f32 re-rank restores exact distances either way.

The exact f32 re-rank over the emitted candidates stays in ops/knn.py
(shared with the XLA path), so reported distances are exact for returned
indices, with the same bf16-near-tie ``margin`` contract as the XLA kernel.

Replaces the same reference hot loop as ops/knn.py: the FAISS
IndexFlatL2 brute-force search (reference src/geo/knn_graph_optimized.py:
70-126) and the sklearn NearestNeighbors path (ibid:25-60).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = float("inf")
_BIG_I32 = 2**31 - 1
# lane width of the emitted candidate block; k + margin must fit
CAND_LANES = 128


def _select_kernel(nv_ref, q_ref, x_ref, outd_ref, outi_ref,
                   a1, a2, i1, i2, *, bins: int, k_sel: int):
    j = pl.program_id(1)
    n_dt = pl.num_programs(1)
    db_tile = x_ref.shape[1]

    @pl.when(j == 0)
    def _():
        a1[:] = jnp.full_like(a1, _INF)
        a2[:] = jnp.full_like(a2, _INF)
        i1[:] = jnp.full_like(i1, -1)
        i2[:] = jnp.full_like(i2, -1)

    # (T, B) squared distances in one MXU pass (default precision = bf16
    # multiply passes, f32 accumulate — same selection precision as the
    # XLA kernel; the exact re-rank restores exact distances)
    d = jax.lax.dot_general(
        q_ref[:], x_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) + j * db_tile
    d = jnp.where(col < nv_ref[0, 0], d, _INF)  # mask padded db rows

    # binned top-2 update: slot = global row mod bins (the tile width is a
    # multiple of bins, so slot == column within each bins-wide sub-block).
    # `ids` is rebuilt per sub-block rather than sliced from `col`: Mosaic
    # stores a dim-1 iota sublane-replicated (one vreg), and lane-slicing a
    # replicated vector trips apply-vector-layout's extract_strided_slice
    # check (limits 16 vs dim 1 SIGABRT on v5e).
    for s in range(db_tile // bins):
        ds = d[:, s * bins:(s + 1) * bins]
        ids = (jax.lax.broadcasted_iota(jnp.int32, (d.shape[0], bins), 1)
               + (j * db_tile + s * bins))
        va1, va2, vi1, vi2 = a1[:], a2[:], i1[:], i2[:]
        lt1 = ds < va1
        lt2 = ds < va2
        a2[:] = jnp.where(lt1, va1, jnp.where(lt2, ds, va2))
        i2[:] = jnp.where(lt1, vi1, jnp.where(lt2, ids, vi2))
        a1[:] = jnp.where(lt1, ds, va1)
        i1[:] = jnp.where(lt1, ids, vi1)

    @pl.when(j == n_dt - 1)
    def _():
        # peel the k_sel smallest accumulator entries per row; everything
        # happens on (T, 2*bins) VMEM registers
        full_d = jnp.concatenate([a1[:], a2[:]], axis=1)
        full_i = jnp.concatenate([i1[:], i2[:]], axis=1)
        cols2 = jax.lax.broadcasted_iota(jnp.int32, full_d.shape, 1)
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (full_d.shape[0], CAND_LANES), 1)
        out_d = jnp.full((full_d.shape[0], CAND_LANES), _INF, jnp.float32)
        out_i = jnp.full((full_d.shape[0], CAND_LANES), -1, jnp.int32)
        for t in range(k_sel):
            vmin = jnp.min(full_d, axis=1, keepdims=True)      # (T, 1)
            is_min = full_d == vmin
            colm = jnp.min(jnp.where(is_min, cols2, _BIG_I32), axis=1,
                           keepdims=True)
            picked = cols2 == colm  # first occurrence of the row min
            cid = jnp.sum(jnp.where(picked, full_i, 0), axis=1,
                          keepdims=True)
            out_d = jnp.where(lane == t, vmin, out_d)
            out_i = jnp.where(lane == t, cid, out_i)
            full_d = jnp.where(picked, _INF, full_d)
        outd_ref[:] = out_d
        outi_ref[:] = out_i


def _select_kernel_packed(nv_ref, q_ref, x_ref, outd_ref, outi_ref,
                          k1, k2, *, bins: int, k_sel: int, blk_bits: int):
    j = pl.program_id(1)
    n_dt = pl.num_programs(1)
    db_tile = x_ref.shape[1]
    lo_mask = (1 << blk_bits) - 1
    hi_mask = ~lo_mask  # i32: keeps sign+exponent+high mantissa bits

    @pl.when(j == 0)
    def _():
        k1[:] = jnp.full_like(k1, _BIG_I32)
        k2[:] = jnp.full_like(k2, _BIG_I32)

    d = jax.lax.dot_general(
        q_ref[:], x_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # clamp tiny negative cancellation residue: non-negative f32 bit
    # patterns are order-isomorphic to i32, which is what makes one
    # integer compare order (distance, block) pairs correctly
    d = jnp.maximum(d, 0.0)
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) + j * db_tile
    d = jnp.where(col < nv_ref[0, 0], d, _INF)  # mask padded db rows

    for s in range(db_tile // bins):
        ds = d[:, s * bins:(s + 1) * bins]
        bid = j * (db_tile // bins) + s  # scalar: origin block of this slot
        ki = (jax.lax.bitcast_convert_type(ds, jnp.int32) & hi_mask) | bid
        v1, v2 = k1[:], k2[:]
        lt1 = ki < v1
        lt2 = ki < v2
        k2[:] = jnp.where(lt1, v1, jnp.where(lt2, ki, v2))
        k1[:] = jnp.where(lt1, ki, v1)

    @pl.when(j == n_dt - 1)
    def _():
        full = jnp.concatenate([k1[:], k2[:]], axis=1)  # (T, 2*bins) keys
        cols2 = jax.lax.broadcasted_iota(jnp.int32, full.shape, 1)
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (full.shape[0], CAND_LANES), 1)
        out_d = jnp.full((full.shape[0], CAND_LANES), _INF, jnp.float32)
        out_i = jnp.full((full.shape[0], CAND_LANES), -1, jnp.int32)
        for t in range(k_sel):
            vmin = jnp.min(full, axis=1, keepdims=True)        # (T, 1)
            is_min = full == vmin
            colm = jnp.min(jnp.where(is_min, cols2, _BIG_I32), axis=1,
                           keepdims=True)
            picked = cols2 == colm  # first occurrence of the row min
            # decode: distance = high bits as f32 (exact-selection value up
            # to the truncated low mantissa; +inf/NaN for padded / never-
            # filled slots — the exact re-rank masks non-finite values),
            # index = origin block * bins + slot lane
            dist = jax.lax.bitcast_convert_type(vmin & hi_mask, jnp.float32)
            slot = colm & (bins - 1)  # bins is a power of two
            cid = (vmin & lo_mask) * bins + slot
            # non-finite distance = padded db row or never-filled slot:
            # emit cid=-1 (the unpacked kernel's contract) so a consumer
            # that doesn't mask non-finite cand_d can't read padded rows
            cid = jnp.where(jnp.isfinite(dist), cid, -1)
            out_d = jnp.where(lane == t, dist, out_d)
            out_i = jnp.where(lane == t, cid, out_i)
            full = jnp.where(picked, _BIG_I32, full)
        outd_ref[:] = out_d
        outi_ref[:] = out_i


@functools.partial(
    jax.jit,
    static_argnames=("metric", "sel_tile", "db_tile", "bins", "k_sel",
                     "interpret", "packed"))
def fused_select(zq: jax.Array, z: jax.Array, n_valid: jax.Array, *,
                 metric: str, sel_tile: int, db_tile: int, bins: int,
                 k_sel: int, interpret: bool, packed: bool = False):
    """Top-``k_sel`` candidate (distances, indices), each (Qp, 128).

    ``zq`` (Qp, D) and ``z`` (Np, D) must be f32 with Qp % sel_tile == 0 and
    Np % db_tile == 0; rows >= ``n_valid`` of ``z`` are treated as padding.
    Lanes >= k_sel of the output carry (+inf, -1); distances are the
    selection values (squared euclidean / cosine), not exact — callers
    re-rank exactly.
    """
    if k_sel > CAND_LANES:
        raise ValueError(f"k_sel={k_sel} exceeds {CAND_LANES} lanes")
    if db_tile % bins:
        raise ValueError("db_tile must be a multiple of bins")
    qp, dim = zq.shape
    np_ = z.shape[0]
    if packed:
        if bins & (bins - 1):
            raise ValueError("packed selection requires power-of-two bins")
        blk_bits = max(1, (np_ // bins - 1).bit_length())
        if blk_bits > 16:
            raise ValueError(
                f"packed selection would truncate {blk_bits} > 16 mantissa "
                f"bits at N={np_}, bins={bins}; raise bins or use unpacked")
    ones_q = jnp.ones((qp, 1), jnp.float32)
    ones_x = jnp.ones((np_, 1), jnp.float32)
    if metric == "cosine":
        qa = jnp.concatenate([-zq, ones_q], axis=1)
        xa = jnp.concatenate([z, ones_x], axis=1)
    else:
        qa = jnp.concatenate(
            [-2.0 * zq, (zq * zq).sum(axis=1, keepdims=True), ones_q],
            axis=1)
        xa = jnp.concatenate(
            [z, ones_x, (z * z).sum(axis=1, keepdims=True)], axis=1)
    d_aug = _round_up(qa.shape[1], 8)  # f32 sublane multiple
    qa = jnp.pad(qa, ((0, 0), (0, d_aug - qa.shape[1]))).T  # (Da, Qp)
    xa = jnp.pad(xa, ((0, 0), (0, d_aug - xa.shape[1]))).T  # (Da, Np)
    nv = jnp.asarray(n_valid, jnp.int32).reshape(1, 1)

    if packed:
        kernel = functools.partial(_select_kernel_packed, bins=bins,
                                   k_sel=k_sel, blk_bits=blk_bits)
        scratch = [pltpu.VMEM((sel_tile, bins), jnp.int32),
                   pltpu.VMEM((sel_tile, bins), jnp.int32)]
    else:
        kernel = functools.partial(_select_kernel, bins=bins, k_sel=k_sel)
        scratch = [pltpu.VMEM((sel_tile, bins), jnp.float32),
                   pltpu.VMEM((sel_tile, bins), jnp.float32),
                   pltpu.VMEM((sel_tile, bins), jnp.int32),
                   pltpu.VMEM((sel_tile, bins), jnp.int32)]
    return pl.pallas_call(
        kernel,
        grid=(qp // sel_tile, np_ // db_tile),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((d_aug, sel_tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_aug, db_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((sel_tile, CAND_LANES), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sel_tile, CAND_LANES), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qp, CAND_LANES), jnp.float32),
            jax.ShapeDtypeStruct((qp, CAND_LANES), jnp.int32),
        ],
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * np_ * d_aug,
            bytes_accessed=(qp // sel_tile) * np_ * d_aug * 4
            + qp * d_aug * 4 + qp * CAND_LANES * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(nv, qa, xa)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
