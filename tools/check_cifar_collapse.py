#!/usr/bin/env python
"""Cheap posterior-collapse probe for the CIFAR spatial recipe.

Trains the spatial VAE on the synthetic CIFAR dataset at reduced scale
and reports the collapse diagnostics that round 3's full run failed:
per-dim latent std, KL per latent cell, and the decoder-Jacobian scale
(mean Riemannian length of random latent perturbations). Run it on CPU
before burning a TPU pipeline run on a recipe change.

Usage:
  VQVAE_TPU_PLATFORM=cpu python tools/check_cifar_collapse.py \
      --size 4096 --epochs 30
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
import _common  # noqa: F401,E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--preset", default="configs/cifar10/spatial/geodesic")
    args = ap.parse_args()

    from vqvae_tpu.config import Config, load_config
    from vqvae_tpu.cli.train_vae import train_vae_main

    raw = load_config(Path(args.preset) / "vae.yaml").to_dict()
    raw["max_epochs"] = args.epochs
    raw["early_stop"] = 0
    raw["scheduler"]["t_max"] = args.epochs
    raw["data"]["synthetic_size"] = args.size
    out = Path("experiments/_cifar_collapse_probe")
    raw["out_dir"] = str(out)
    cfg = Config(raw)
    train_vae_main(cfg)

    run_dir = out / "spatial_vae_cifar10"
    from vqvae_tpu.utils.latents import load_latents

    lat = load_latents(run_dir / "latents_train")
    z = lat["z"].reshape(-1, lat["z"].shape[-1]).astype(np.float32)
    per_dim_std = z.std(axis=0)

    # decoder-Jacobian scale: Riemannian length of unit random tangents
    from vqvae_tpu.utils.checkpoint import load_vae_from_checkpoint
    from vqvae_tpu.ops import edge_lengths_riemannian
    from vqvae_tpu.ops.riemannian import make_decoder_image_fn

    vae_cfg = {k: cfg["model"][k] for k in
               ("in_channels", "output_image_size", "latent_dim",
                "enc_channels", "dec_channels", "norm_type", "topology")}
    vae_cfg["enc_channels"] = tuple(vae_cfg["enc_channels"])
    vae_cfg["dec_channels"] = tuple(vae_cfg["dec_channels"])
    model, variables = load_vae_from_checkpoint(
        run_dir / "checkpoints", "best", config=vae_cfg,
        recon_loss=cfg["model"].get("recon_loss", "mse"),
        mse_use_sigmoid=bool(cfg["model"].get("mse_use_sigmoid", True)))
    decode_fn = make_decoder_image_fn(model, variables, "spatial")
    rng = np.random.default_rng(0)
    idx = rng.integers(0, len(z), size=2048)
    za = z[idx]
    zb = za + rng.normal(0, per_dim_std.mean() + 1e-8,
                         size=za.shape).astype(np.float32)
    lengths = edge_lengths_riemannian(decode_fn, za, zb, batch_size=512)

    res = {
        "latent_std_mean": float(per_dim_std.mean()),
        "latent_std_min": float(per_dim_std.min()),
        "riem_length_mean": float(lengths.mean()),
        "riem_length_p90": float(np.quantile(lengths, 0.9)),
        "collapsed": bool(per_dim_std.mean() < 1e-3
                          or lengths.mean() < 1e-6),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
