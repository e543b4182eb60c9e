#!/usr/bin/env python
"""Focused k-medoids fit benchmark: host vs device backend at any scale.

Builds a kNN graph (euclidean distance weights — relaxation cost does not
depend on the weight source) from bench.py's clustered latents, BFS-
reorders, then times ``fit_kmedoids(init='kpp_parallel')`` per backend.
Used to (re)measure the ops.backend HOST_WORK_THRESHOLD crossover after
relaxation-engine changes, and to validate north-star-scale fits.

Usage:
  python tools/bench_fit.py --nodes 196608 --codes 512 \
      --backends host,device --runs 2
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os  # noqa: E402

os.environ.setdefault("VQVAE_TPU_ELL_STATS", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=196608)
    ap.add_argument("--codes", type=int, default=512)
    ap.add_argument("--knn", type=int, default=10)
    ap.add_argument("--rounds", default="8",
                    help="comma list of kpp_rounds values to A/B in one "
                         "process (e.g. 1,2,4 — fewer/wider rounds trade "
                         "pass count against row width)")
    ap.add_argument("--schedule", default="flat")
    ap.add_argument("--backends", default="auto")
    ap.add_argument("--active", default="1",
                    help="comma list of VQVAE_TPU_ELL_ACTIVE values to A/B "
                         "(e.g. 1,0) — frontier skipping on/off")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--graph-cache", default=None,
                    help="npz path caching the kNN graph at this shape")
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from bench import make_latents  # noqa: E402

    from vqvae_tpu.ops import build_knn_graph, fit_kmedoids
    from vqvae_tpu.ops.ell import ELL_STATS

    print(f"devices={jax.devices()} nodes={args.nodes} K={args.codes}",
          file=sys.stderr)
    cache = Path(args.graph_cache) if args.graph_cache else None
    if cache is not None and cache.exists():
        from scipy import sparse

        W = sparse.load_npz(cache)
        assert W.shape[0] == args.nodes, (W.shape, args.nodes)
        print(f"[graph] loaded {cache} nnz={W.nnz}", file=sys.stderr)
    else:
        z = make_latents(args.nodes, dim=16, seed=0)
        t0 = time.perf_counter()
        W, _ = build_knn_graph(z, k=args.knn, metric="euclidean",
                               mode="distance", sym="union")
        print(f"[graph] {time.perf_counter() - t0:.1f}s nnz={W.nnz}",
              file=sys.stderr)
        if cache is not None:
            from scipy import sparse

            sparse.save_npz(cache, W.tocsr())
            print(f"[graph] saved {cache}", file=sys.stderr)

    results = {}
    rounds_list = [int(x) for x in str(args.rounds).split(",")]
    for backend in args.backends.split(","):
      for rounds in rounds_list:
        for act in args.active.split(","):
            os.environ["VQVAE_TPU_ELL_ACTIVE"] = act
            label = backend + (f"-r{rounds}" if len(rounds_list) > 1 else "")
            label += "" if act == "1" else f"-active{act}"
            times, qes = [], []
            for r in range(args.runs + 1):  # first run = warm-up/compile
                n0 = len(ELL_STATS)
                t1 = time.perf_counter()
                _, _, qe = fit_kmedoids(W, K=args.codes,
                                        init="kpp_parallel",
                                        kpp_rounds=rounds, seed=42,
                                        backend=backend)
                dt = time.perf_counter() - t1
                ell = ELL_STATS[n0:]
                sweeps = [e["iters"] for e in ell]
                frac = [round(e.get("active_frac", 1.0), 2) for e in ell]
                gbps = (sum(e["bytes"] for e in ell)
                        / max(sum(e["seconds"] for e in ell), 1e-9) / 1e9)
                solver = sum(e["seconds"] for e in ell)
                print(f"[{label}] run{r}: {dt:.1f}s (solver {solver:.1f}s) "
                      f"qe={qe:.1f} passes={len(ell)} sweeps={sweeps} "
                      f"active={frac} relax={gbps:.0f}GB/s",
                      file=sys.stderr)
                if r > 0:
                    times.append(dt)
                    qes.append(qe)
            results[label] = {"seconds": round(min(times), 2),
                              "qe": round(qes[0], 2)}
    print(json.dumps({"nodes": args.nodes, "codes": args.codes,
                      "results": results}))


if __name__ == "__main__":
    main()
