#!/usr/bin/env python
"""Train a spatial VAE (reference src/scripts/train_vae.py CLI parity)."""
import argparse

import _common  # noqa: F401

from vqvae_tpu.config import load_config
from vqvae_tpu.cli import train_vae_main

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True,
                        help="Path to the training config file.")
    args = parser.parse_args()
    train_vae_main(load_config(args.config), topology="spatial")
