#!/usr/bin/env python
"""Config-driven five-stage pipeline runner.

Replaces the reference's six per-dataset orchestrator scripts with one
parameterized CLI (same --skip-* resume flags). Examples:

    python scripts/run_pipeline.py --preset configs/fashionmnist/spatial/geodesic
    python scripts/run_pipeline.py --preset configs/sandbox-fashion/geodesic --skip-vae
"""
import argparse
import json

import _common  # noqa: F401

from vqvae_tpu.cli.pipeline import run_pipeline, STAGES

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", type=str, required=True,
                        help="configs/<dataset>/<variant>/<distance> directory")
    for stage in STAGES:
        parser.add_argument(f"--skip-{stage}", action="store_true")
    # reference flag-name aliases (run_*_pipeline.py:36-37)
    parser.add_argument("--skip-generation", action="store_true",
                        dest="skip_generate")
    parser.add_argument("--skip-evaluation", action="store_true",
                        dest="skip_evaluate")
    parser.add_argument("--timings-out", type=str, default=None,
                        help="write per-stage wall-clock JSON here")
    args = parser.parse_args()
    skip = {s for s in STAGES if getattr(args, f"skip_{s}")}
    timings = run_pipeline(args.preset, skip=skip)
    if args.timings_out:
        with open(args.timings_out, "w") as f:
            json.dump(timings, f, indent=2)
