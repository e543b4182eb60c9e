#!/usr/bin/env python
"""Train a vanilla (flat-latent) VAE (reference src/scripts/train_vanilla_vae.py)."""
import argparse

import _common  # noqa: F401

from vqvae_tpu.config import load_config
from vqvae_tpu.cli import train_vae_main

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True,
                        help="Path to the training config file.")
    args = parser.parse_args()
    train_vae_main(load_config(args.config), topology="flat")
