#!/usr/bin/env python
"""evaluate_vae_quality quality gate (reference src/eval/evaluate_vae_quality.py)."""
import argparse
import sys

import _common  # noqa: F401

from vqvae_tpu.cli.quality_checks import evaluate_vae_quality_main

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--experiment", required=True, help="Experiment directory")
    parser.add_argument("--dataset", default="fashionmnist")
    parser.add_argument("--batch_size", type=int, default=512)
    parser.add_argument("--max_samples", type=int, default=1000)
    args = parser.parse_args()
    kwargs = dict(dataset=args.dataset, batch_size=args.batch_size)
    if "evaluate_vae_quality" != "evaluate_codebook_health":
        kwargs["max_samples"] = args.max_samples
    sys.exit(evaluate_vae_quality_main(args.experiment, **kwargs))
