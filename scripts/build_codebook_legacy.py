#!/usr/bin/env python
"""Euclidean flat-latent codebook builder (reference
src/training/build_codebook_legacy.py CLI)."""
import argparse

import _common  # noqa: F401

from vqvae_tpu.config import load_config
from vqvae_tpu.cli import build_codebook_legacy_main

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    args = parser.parse_args()
    build_codebook_legacy_main(load_config(args.config), riemannian=False)
