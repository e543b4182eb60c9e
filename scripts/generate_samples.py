#!/usr/bin/env python
"""Generate class-conditional samples (reference src/scripts/generate_samples.py)."""
import argparse

import _common  # noqa: F401

from vqvae_tpu.config import load_config
from vqvae_tpu.cli import generate_samples_main

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True,
                        help="Path to the sampling config file.")
    args = parser.parse_args()
    generate_samples_main(load_config(args.config))
