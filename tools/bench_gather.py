#!/usr/bin/env python
"""Gather-bandwidth microbench for the ELL relaxation access pattern.

The bucketed relaxation sweep (vqvae_tpu/ops/ell.py:_ell_run) is bound by
row gathers ``d[nbr]`` of (K,)-f32 rows out of an (N, K) distance matrix
(~14 GB/s effective observed at 196k/K=512 in round 1). Before investing
in a Pallas DMA-pipelined kernel (REPORT.md round-2 plan item 1), run this
on the real chip to separate descriptor-rate limits from payload limits:

  VQVAE_TPU_PLATFORM=tpu python tools/bench_gather.py

It sweeps row width K (DMA payload per descriptor) and index locality
(random vs. sorted ~= BFS-reordered) and prints one JSON line per config
with achieved GB/s. If GB/s grows ~linearly with K at fixed row count,
the gathers are descriptor-rate-bound and the Pallas kernel should pack
multiple logical rows per descriptor; if GB/s is flat in K, it is
payload-bandwidth-bound and a Pallas kernel will not help.

MEASURED (TPU v5e, 2026-08-16, 196608 rows x 65536x16 gathers):
  K=256: 63 GB/s (61 M rows/s)   K=512: 72 GB/s (35 M rows/s)
  K=1024: 94 GB/s (23 M rows/s)  sorted == random (no locality effect)
A direct `_ell_run` 1-vs-3-sweep probe at 196k/K=512/deg-16 gave
49 ms/sweep = 98 GB/s effective, ~40 ms fixed overhead per call.
Conclusion: the sweep is near payload-bound; skip the Pallas DMA
kernel, optimize pass batching instead (REPORT.md round-2 plan).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


_SWEEP = None


def _jitted_sweep():
    global _SWEEP
    if _SWEEP is None:
        _SWEEP = jax.jit(_sweep)
    return _SWEEP


def _sweep(dist, nbr):
    # the ELL inner pattern: gather deg rows per output row, min-reduce
    def relax_j(j, acc):
        return jnp.minimum(acc, dist[nbr[:, j]])

    init = jnp.full((nbr.shape[0], dist.shape[1]), jnp.inf, dist.dtype)
    return jax.lax.fori_loop(0, nbr.shape[1], relax_j, init)


def run_case(n_rows: int, k_width: int, deg: int, n_gather: int,
             sorted_idx: bool, iters: int = 8) -> dict:
    # one module-level jitted sweep: sorted/unsorted share the compiled
    # program per shape (remote compiles here cost minutes each)
    global jax, jnp
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.random((n_rows, k_width), np.float32))
    idx_np = rng.integers(0, n_rows, size=(n_gather, deg)).astype(np.int32)
    if sorted_idx:
        idx_np = np.sort(idx_np, axis=None).reshape(n_gather, deg)
    idx = jnp.asarray(idx_np)

    sweep = _jitted_sweep()
    out = sweep(d, idx)
    _ = float(np.asarray(out[0, 0]))  # compile + warm; forced host sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = sweep(d, idx)
    # materialize to host: on this platform block_until_ready can return
    # before remote execution finishes, so a device->host copy is the only
    # reliable fence
    _ = float(np.asarray(out[0, 0]))
    dt = (time.perf_counter() - t0) / iters

    bytes_moved = n_gather * deg * k_width * 4  # gathered payload per sweep
    rows_per_s = n_gather * deg / dt
    return {
        "n_rows": n_rows, "K": k_width, "deg": deg, "n_gather": n_gather,
        "sorted": sorted_idx, "seconds": round(dt, 5),
        "GBps": round(bytes_moved / dt / 1e9, 2),
        "Mrows_per_s": round(rows_per_s / 1e6, 2),
    }


def main() -> None:
    import jax

    plat = os.environ.get("VQVAE_TPU_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    log(f"[gather-bench] devices={jax.devices()}")

    n_rows = int(os.environ.get("GATHER_ROWS", 196608))
    n_gather = int(os.environ.get("GATHER_N", 65536))
    k_widths = tuple(int(s) for s in
                     os.environ.get("GATHER_K", "256,512,1024").split(","))
    degs = tuple(int(s) for s in os.environ.get("GATHER_DEG", "16").split(","))
    for k_width in k_widths:
        for deg in degs:
            for sorted_idx in (False, True):
                r = run_case(n_rows, k_width, deg, n_gather, sorted_idx)
                print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
