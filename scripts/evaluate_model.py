#!/usr/bin/env python
"""Evaluate generated samples vs real data (reference src/eval/evaluate_model.py)."""
import argparse

import _common  # noqa: F401

from vqvae_tpu.config import load_config
from vqvae_tpu.cli import evaluate_model_main

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True,
                        help="Path to the evaluation config file.")
    args = parser.parse_args()
    evaluate_model_main(load_config(args.config))
