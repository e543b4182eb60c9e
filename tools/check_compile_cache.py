#!/usr/bin/env python
"""Verify whether the persistent XLA compilation cache survives this
platform's REMOTE compile service across processes.

End-to-end reproducibility of the north-star pipeline hinges on warm
compiles (VERDICT r2 weak #4/#8): `scripts/_common.py` sets
`jax_compilation_cache_dir`, but remote compiles surface as
first-dispatch latency and nothing had measured whether a second process
actually hits the cache. Protocol: jit a distinctive program (shapes keyed
by --tag so reruns with a fresh tag recompile) and time first dispatch.

  python tools/check_compile_cache.py --tag A   # cold: compile + run
  python tools/check_compile_cache.py --tag A   # warm iff the cache works

A warm/cold ratio near 1 means the service defeats caching and program
count is the only lever; a small ratio means the cache works and pipeline
reruns should be trusted warm.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="A",
                    help="distinct tags force distinct program shapes")
    ap.add_argument("--cache-dir",
                    default=os.path.expanduser("~/.cache/vqvae_tpu_xla"))
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", args.cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    import numpy as np

    # shape depends on the tag -> distinct program per tag
    n = 4096 + 128 * (sum(ord(c) for c in args.tag) % 13)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(n, 512).astype(np.float32))
    w = jnp.asarray(rs.rand(512, 512).astype(np.float32))

    @jax.jit
    def distinctive(x):
        # a few fused stages so the program is big enough to cache
        # (persistent cache skips sub-threshold compiles)
        for i in range(6):
            x = jnp.tanh(x @ w * 0.01 + i)
        return jnp.sort(x, axis=1)[:, -8:].sum()

    t0 = time.perf_counter()
    jax.block_until_ready(distinctive(x))
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(distinctive(x))
    steady = time.perf_counter() - t0
    cached_files = len(list(Path(args.cache_dir).glob("*"))) \
        if Path(args.cache_dir).exists() else 0
    print(json.dumps({"tag": args.tag, "n": n,
                      "first_dispatch_s": round(first, 2),
                      "steady_s": round(steady, 4),
                      "cache_dir_entries": cached_files,
                      "devices": str(jax.devices())}))


if __name__ == "__main__":
    main()
