#!/usr/bin/env python
"""Baseline VQ-VAE pipeline: train then evaluate (reference
scripts/run_baseline_pipeline.py, in-process instead of subprocess)."""
import argparse
import subprocess
import sys

import _common  # noqa: F401

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, default="configs/baseline_vqvae/config.yaml")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--epochs", type=int, default=None)
    args = ap.parse_args()

    here = _common.REPO_ROOT / "scripts"
    if not args.skip_train:
        cmd = [sys.executable, str(here / "train_baseline_vqvae.py"),
               "--config", args.config]
        if args.epochs is not None:
            cmd += ["--epochs", str(args.epochs)]
        subprocess.run(cmd, check=True)
    subprocess.run([sys.executable, str(here / "evaluate_baseline_simple.py"),
                    "--config", args.config], check=True)
