#!/usr/bin/env python
"""Measured answer to "would a Pallas DMA-pipelined relaxation beat XLA?"
(VERDICT r1 item 6; SURVEY §2.2 row 1).

The ELL relaxation's hot operation is a random-row gather-reduce:

    acc = min_j ( D[idx_j] )      # idx random, rows of K f32

This benchmark runs that exact access pattern two ways on the same data:

1. XLA: ``D[idx].min(axis=0)`` under jit (what ops/ell.py compiles to),
2. Pallas: an S-deep DMA pipeline — per-row HBM->VMEM async copies with
   S semaphore slots in flight, VPU min into an accumulator (the
   hand-pipelined kernel a "faster relaxation" would be built from).

Both are fenced with a device-to-host copy (block_until_ready can return
early on this platform). Reports GB/s and rows/s per row width so the
descriptor-rate roofline is explicit: if the Pallas column is not clearly
faster, the relaxation stays XLA (docs/benchmarks.md records the verdict).

Usage: python tools/bench_pallas_gather.py [--rows 1048576] [--n 196608]
           [--widths 256,512,1024] [--slots 8] [--platform tpu|cpu]
"""
from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CHUNK = 1024  # gathered rows per grid step (index block lives in SMEM)


def _gather_min_kernel(idx_ref, d_hbm, out_ref, scratch, sems):
    """min-reduce CHUNK random rows of d_hbm, S-deep DMA pipeline.

    ``d_hbm`` is the (N, K) matrix FLATTENED to (N*K,): Mosaic cannot slice
    a single row out of an (8,128)-tiled 2-D HBM memref (sublane tiling),
    but a 1-D (K,)-sized block at a K-aligned dynamic offset is legal for
    K % 128 == 0 — the "row gather as 1-D block copy" trick.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    step = pl.program_id(0)
    k = out_ref.shape[1]
    s_depth = scratch.shape[0] // k  # scratch is 1-D: (slots * k,)

    def dma(slot, j):
        # both sides 1-D: 2-D (8,128)-tiled memrefs cannot be sliced at
        # single-row granularity, but k-aligned 1-D blocks can
        return pltpu.make_async_copy(
            d_hbm.at[pl.ds(pl.multiple_of(idx_ref[j] * k, k), k)],
            scratch.at[pl.ds(pl.multiple_of(slot * k, k), k)],
            sems.at[slot],
        )

    for s in range(s_depth - 1):  # prologue: S-1 copies in flight
        dma(s, s).start()

    def body(j, acc):
        @pl.when(j + s_depth - 1 < CHUNK)
        def _():
            dma((j + s_depth - 1) % s_depth, j + s_depth - 1).start()

        slot = j % s_depth
        dma(slot, j).wait()
        row = scratch[pl.ds(pl.multiple_of(slot * k, k), k)]
        return jnp.minimum(acc, row)

    acc = jax.lax.fori_loop(
        0, CHUNK, body,
        jnp.full((out_ref.shape[1],), jnp.inf, jnp.float32))

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.full_like(out_ref, jnp.inf)

    out_ref[:] = jnp.minimum(out_ref[:], acc[None, :])


@functools.partial(__import__("jax").jit,
                   static_argnames=("slots", "interpret"))
def pallas_gather_min(d, idx, slots: int = 8, interpret: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r = idx.shape[0]
    k = d.shape[1]
    assert r % CHUNK == 0 and k % 128 == 0
    grid = (r // CHUNK,)
    return pl.pallas_call(
        _gather_min_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # D stays in HBM
        ],
        out_specs=pl.BlockSpec((1, k), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, k), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((slots * k,), jnp.float32),
            pltpu.SemaphoreType.DMA((slots,)),
        ],
        interpret=interpret,
    )(idx, d.reshape(-1))


def _fence(x) -> float:
    return float(np.asarray(x).ravel()[0])


def bench_width(n: int, k: int, rows: int, slots: int, reps: int = 3):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.random((n, k), dtype=np.float32))
    idx = jnp.asarray(rng.integers(0, n, rows), jnp.int32)

    xla_fn = jax.jit(lambda d, i: d[i].min(axis=0))

    # correctness first
    ours = np.asarray(pallas_gather_min(d, idx, slots=slots))[0]
    ref = np.asarray(xla_fn(d, idx))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)

    out = {}
    for name, fn in (("xla", lambda: xla_fn(d, idx)),
                     ("pallas", lambda: pallas_gather_min(d, idx,
                                                          slots=slots))):
        _fence(fn())  # warm
        best = min(_timed(fn) for _ in range(reps))
        gb = rows * k * 4 / best / 1e9
        out[name] = {"seconds": best, "gbps": round(gb, 1),
                     "mrows_s": round(rows / best / 1e6, 1)}
    return out


def _timed(fn) -> float:
    t0 = time.perf_counter()
    _fence(fn())
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 20)
    ap.add_argument("--n", type=int, default=196608)
    ap.add_argument("--widths", default="256,512,1024")
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    print(f"devices={jax.devices()} rows={args.rows} n={args.n} "
          f"slots={args.slots}")
    for k in (int(w) for w in args.widths.split(",")):
        res = bench_width(args.n, k, args.rows, args.slots)
        print(f"K={k:5d} ({k * 4}B rows): "
              f"xla {res['xla']['gbps']:7.1f} GB/s "
              f"({res['xla']['mrows_s']} Mrows/s) | "
              f"pallas {res['pallas']['gbps']:7.1f} GB/s "
              f"({res['pallas']['mrows_s']} Mrows/s)")


if __name__ == "__main__":
    main()
