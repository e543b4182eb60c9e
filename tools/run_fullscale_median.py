#!/usr/bin/env python
"""Median-of-3 end-to-end fullscale pipeline timing (VERDICT r3 item 7).

Runs the fullscale FashionMNIST spatial geodesic pipeline N times in ONE
process/session (so the comparison is same-weather and programs compile
once) and records every run's per-stage timings plus the median total in
``experiments/fullscale-fashion-timings.json``. The previous quoted
number was a single run (396-1218s across sessions); this replaces the
anecdote with a median + band.

Usage:
  python tools/run_fullscale_median.py [--runs 3] [--preset ...]
"""
from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--preset", default="configs/fullscale-fashion")
    ap.add_argument("--out",
                    default="experiments/fullscale-fashion-timings.json")
    args = ap.parse_args()

    import _common  # noqa: F401,E402

    from vqvae_tpu.cli.pipeline import run_pipeline  # noqa: E402

    runs = []
    for r in range(args.runs):
        t0 = time.perf_counter()
        timings = run_pipeline(args.preset)
        total = time.perf_counter() - t0
        rec = {"run": r, "total_seconds": round(total, 1),
               "stages": timings}
        runs.append(rec)
        print(f"[median-run {r}] total={total:.1f}s stages={timings}",
              file=sys.stderr)

    totals = [r["total_seconds"] for r in runs]
    out = {
        "protocol": f"{args.runs} full pipeline runs in one process/session"
                    " (programs compile once; run 0 carries the compiles)",
        "runs": runs,
        "median_total_seconds": statistics.median(totals),
        "band_seconds": [min(totals), max(totals)],
    }
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"median_total_seconds": out["median_total_seconds"],
                      "band_seconds": out["band_seconds"]}))


if __name__ == "__main__":
    main()
