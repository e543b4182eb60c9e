#!/usr/bin/env python
"""Legacy-config VAE training: composes the reference's top-level
configs/vae.yaml (architecture) + configs/data.yaml (dataset) into one
training run (the reference's original MNIST/FashionMNIST workflow,
CPU-runnable: set VQVAE_TPU_PLATFORM=cpu)."""
import argparse

import _common  # noqa: F401

import yaml

from vqvae_tpu.config import Config
from vqvae_tpu.cli import train_vae_main

if __name__ == "__main__":
    default_vae = str(_common.REPO_ROOT / "configs" / "vae.yaml")
    default_data = str(_common.REPO_ROOT / "configs" / "data.yaml")
    parser = argparse.ArgumentParser()
    parser.add_argument("--vae-config", type=str, default=default_vae)
    parser.add_argument("--data-config", type=str, default=default_data)
    parser.add_argument("--out-dir", type=str, default="experiments/vae_legacy")
    parser.add_argument("--epochs", type=int, default=30)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--synthetic-size", type=int, default=None)
    args = parser.parse_args()

    with open(args.vae_config) as f:
        model_cfg = yaml.safe_load(f)
    with open(args.data_config) as f:
        data_cfg = yaml.safe_load(f)
    if args.synthetic_size:
        data_cfg["synthetic_size"] = args.synthetic_size

    cfg = Config({
        "seed": 42,
        "max_epochs": args.epochs,
        "lr": args.lr,
        "weight_decay": 1e-4,
        "early_stop": 0,
        "out_dir": args.out_dir,
        "save_latents": True,
        "data": data_cfg,
        "model": model_cfg,
    })
    train_vae_main(cfg, topology=model_cfg.get("topology", "flat"))
