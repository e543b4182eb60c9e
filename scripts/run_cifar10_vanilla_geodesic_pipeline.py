#!/usr/bin/env python
"""cifar10 vanilla geodesic pipeline (named wrapper; see run_pipeline.py)."""
import argparse
import _common  # noqa: F401
from vqvae_tpu.cli.pipeline import run_pipeline, STAGES

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    for stage in STAGES:
        parser.add_argument(f"--skip-{stage}", action="store_true")
    parser.add_argument("--skip-generation", action="store_true",
                        dest="skip_generate")
    parser.add_argument("--skip-evaluation", action="store_true",
                        dest="skip_evaluate")
    args = parser.parse_args()
    skip = {s for s in STAGES if getattr(args, f"skip_{s}")}
    run_pipeline("configs/cifar10/vanilla/geodesic", skip=skip)
