#!/usr/bin/env python
"""kNN kernel tile-shape sweep on the real chip.

The codebook stage is now dominated by the exact kNN build (the k-medoids
fit dropped to ~21s at 983k/K=512), so the block kernel's tile shapes
matter. Sweeps (query_tile, db_tile, approx) at a fixed shape and reports
steady-state seconds per full self-kNN.

Usage:
  python tools/bench_knn.py --nodes 196608 --k 10 \
      --cases 1024x8192,1024x16384,2048x8192 --approx 0,1
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=196608)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--cases", default="1024x8192,1024x16384,1024x32768,"
                                       "2048x8192,2048x16384,512x8192")
    ap.add_argument("--approx", default="0,1")
    ap.add_argument("--agg", default="1",
                    help="aggregate_to_topk values to sweep (0 = defer all "
                         "aggregation to the final exact re-rank)")
    ap.add_argument("--recalls", default=None,
                    help="sweep approx recall_target values, e.g. "
                         "0.9,0.95,0.99 (reports recall vs the exact run)")
    ap.add_argument("--pallas-cases", default=None,
                    help="sweep the fused Pallas kernel: comma-separated "
                         "rerank_tile x db_tile x bins [x sel_tile "
                         "[x margin [x packed]]] cases, e.g. "
                         "1024x2048x1024,1024x4096x1024x256x4x1 (reports "
                         "recall vs an exact XLA run)")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default=None,
                    help="also write the results JSON here incrementally "
                         "(after every case), so a mid-sweep crash keeps "
                         "the completed cases")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from bench import make_latents  # noqa: E402

    from vqvae_tpu.ops.knn import knn_search

    print(f"devices={jax.devices()} nodes={args.nodes} k={args.k}",
          file=sys.stderr)
    z = make_latents(args.nodes, dim=args.dim, seed=0)
    results = {}

    def checkpoint():
        """Persist partial results after every case: a crash mid-sweep
        (device fault, bad config) must not lose the completed cases."""
        if args.out:
            Path(args.out).write_text(json.dumps(
                {"nodes": args.nodes, "k": args.k, "results": results}))
    for case in args.cases.split(","):
        if not case:  # --cases '' skips the XLA tile sweep entirely
            continue
        qt, dt = (int(x) for x in case.split("x"))
        for ap_flag in (int(x) for x in args.approx.split(",")):
            for agg in (int(x) for x in args.agg.split(",")):
                if not agg and not ap_flag:
                    continue  # agg=0 only applies to approx selection
                times = []
                for r in range(args.runs + 1):  # run 0 = compile
                    t0 = time.perf_counter()
                    d, i = knn_search(z, k=args.k + 1, query_tile=qt,
                                      db_tile=dt, approx=bool(ap_flag),
                                      aggregate=bool(agg))
                    # d/i are host numpy — already fenced
                    dt_s = time.perf_counter() - t0
                    if r > 0:
                        times.append(dt_s)
                # cheap exactness probe: self-distance 0 at every row
                self_ok = bool((d[:, 0] <= 1e-5).all())
                key = f"{case}-approx{ap_flag}" + ("-agg0" if not agg else "")
                results[key] = {"seconds": round(min(times), 2),
                                "self_ok": self_ok}
                print(f"[{key}] {min(times):.2f}s (all runs: "
                      f"{[round(t, 2) for t in times]}, self_ok={self_ok})",
                      file=sys.stderr)
                checkpoint()
    if args.recalls:
        d_ref, i_ref = knn_search(z, k=args.k + 1, approx=False)
        ref_sets = [set(r) for r in i_ref]
        for rt in (float(x) for x in args.recalls.split(",")):
            times = []
            for r in range(args.runs + 1):
                t0 = time.perf_counter()
                d, i = knn_search(z, k=args.k + 1, approx=True,
                                  recall_target=rt)
                if r > 0:
                    times.append(time.perf_counter() - t0)
            rec = float(np.mean([len(ref_sets[q].intersection(i[q]))
                                 / i.shape[1]
                                 for q in range(0, len(i), 97)]))
            key = f"recall{rt}"
            results[key] = {"seconds": round(min(times), 2),
                            "recall_vs_exact": round(rec, 5)}
            print(f"[{key}] {min(times):.2f}s recall={rec:.5f}",
                  file=sys.stderr)
            checkpoint()
    if args.pallas_cases:
        import os

        d_ref, i_ref = knn_search(z, k=args.k + 1, approx=False)
        ref_sets = [set(r) for r in i_ref]
        for case in args.pallas_cases.split(","):
            key = f"pallas-{case}"
            try:
                parts = [int(x) for x in case.split("x")]
                qt, dt, bins = parts[:3]
                os.environ["VQVAE_TPU_KNN_BINS"] = str(bins)
                os.environ["VQVAE_TPU_KNN_SELTILE"] = str(
                    parts[3] if len(parts) > 3 else 128)
                margin = parts[4] if len(parts) > 4 else None
                os.environ["VQVAE_TPU_KNN_PACKED"] = str(
                    parts[5] if len(parts) > 5 else 0)
                times = []
                for r in range(args.runs + 1):  # run 0 = compile
                    t0 = time.perf_counter()
                    d, i = knn_search(z, k=args.k + 1, kernel="pallas",
                                      query_tile=qt, db_tile=dt,
                                      margin=margin)
                    if r > 0:
                        times.append(time.perf_counter() - t0)
                rec = float(np.mean([len(ref_sets[q].intersection(i[q]))
                                     / i.shape[1]
                                     for q in range(0, len(i), 97)]))
                results[key] = {"seconds": round(min(times), 2),
                                "recall_vs_exact": round(rec, 5),
                                "self_ok": bool((d[:, 0] <= 1e-5).all())}
                print(f"[{key}] {min(times):.2f}s (all runs: "
                      f"{[round(t, 2) for t in times]}) recall={rec:.5f}",
                      file=sys.stderr)
            except Exception as e:  # isolate a bad config / device fault
                results[key] = {"error": f"{type(e).__name__}: {e}"[:500]}
                print(f"[{key}] FAILED: {type(e).__name__}: {e}",
                      file=sys.stderr)
            checkpoint()
    print(json.dumps({"nodes": args.nodes, "k": args.k, "results": results}))


if __name__ == "__main__":
    main()
