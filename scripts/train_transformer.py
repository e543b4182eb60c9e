#!/usr/bin/env python
"""Train the Transformer prior (reference src/scripts/train_transformer.py)."""
import argparse

import _common  # noqa: F401

from vqvae_tpu.config import load_config
from vqvae_tpu.cli import train_transformer_main

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    args = parser.parse_args()
    train_transformer_main(load_config(args.config))
