#!/usr/bin/env python
"""Measure device->host result-pull bandwidth over the axon tunnel.

The kNN stage's (N, k) distance+index results are pulled to the host for
scipy graph assembly; at the 983k north-star shape that is ~86 MB. This
probe times the pull alone (trivially-computed device arrays, fenced with
block_until_ready before timing np.asarray) so the kNN stage time can be
split into kernel vs transfer — informing whether a connectivity-mode
no-distance-pull path is worth its complexity.

Usage: python tools/probe_pull.py [--rows 983040] [--k 11] [--runs 3]
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=983040)
    ap.add_argument("--k", type=int, default=11)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    print(f"devices={jax.devices()}", file=sys.stderr)
    shape = (args.rows, args.k)

    @jax.jit
    def make(seed):
        key = jax.random.key(seed)
        d = jax.random.uniform(key, shape, jnp.float32)
        i = jnp.argsort(d[: args.k * 4, : args.k], axis=1)  # cheap int payload
        return d, jnp.tile(i, (args.rows // (args.k * 4) + 1, 1))[: args.rows]

    results = {}
    for name, idx in (("f32", 0), ("i32", 1)):
        times = []
        for r in range(args.runs):
            arrs = make(r)
            jax.block_until_ready(arrs)
            t0 = time.perf_counter()
            host = np.asarray(arrs[idx])
            dt = time.perf_counter() - t0
            times.append(dt)
            del host
        mb = args.rows * args.k * 4 / 1e6
        best = min(times)
        results[name] = {"mb": round(mb, 1), "seconds": round(best, 3),
                         "mb_per_s": round(mb / best, 1),
                         "all": [round(t, 3) for t in times]}
        print(f"[{name}] {mb:.0f}MB best {best:.3f}s "
              f"({mb/best:.0f} MB/s; all {times})", file=sys.stderr)
    print(json.dumps({"rows": args.rows, "k": args.k, "results": results}))


if __name__ == "__main__":
    main()
