#!/usr/bin/env python
"""CPU-scale contrastive A/B: does `spatial_free_bits` prevent the CIFAR
spatial posterior collapse?

The full-recipe probe (tools/check_cifar_collapse.py) costs ~800 s/epoch
on this 1-core host — unusable without the TPU. This probe shrinks the
architecture (not the loss path) and trains the SAME config twice,
free-bits off vs on, then reports the collapse diagnostics for both arms:
per-dim mu std, val KL trajectory, and the decoder-Jacobian scale
(mean Riemannian length of unit latent perturbations — the quantity the
geodesic codebook actually consumes).

The collapse mechanism (docs/runs/cifar10-spatial-geodesic-rootcause.md)
is KL pressure killing q(z|x) before recon learns to use z; free-bits
removes the gradient below the per-cell floor, so the fixed arm should
hold var(mu) and Jacobian lengths up while the control arm decays.

Usage:
  VQVAE_TPU_PLATFORM=cpu python tools/ab_cifar_freebits.py \
      [--size 1024] [--epochs 20] [--out docs/runs/cifar-freebits-ab-cpu.json]
"""
from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))
import _common  # noqa: F401,E402


def run_arm(tag: str, free_bits, size: int, epochs: int) -> dict:
    from vqvae_tpu.config import Config, load_config
    from vqvae_tpu.cli.train_vae import train_vae_main
    from vqvae_tpu.utils.latents import load_latents
    from vqvae_tpu.utils.checkpoint import load_vae_from_checkpoint
    from vqvae_tpu.ops import edge_lengths_riemannian
    from vqvae_tpu.ops.riemannian import make_decoder_image_fn

    raw = load_config(REPO / "configs/cifar10/spatial/geodesic/vae.yaml"
                      ).to_dict()
    # shrink the ARCH, keep the LOSS PATH (raw-logit MSE on normalized
    # CIFAR targets, beta 1, no anneal — the collapse-inducing recipe)
    raw["model"]["enc_channels"] = [16, 32, 64]
    raw["model"]["dec_channels"] = [64, 32, 16]
    raw["model"]["spatial_free_bits"] = free_bits
    raw["max_epochs"] = epochs
    raw["early_stop"] = 0
    raw["scheduler"]["t_max"] = epochs
    raw["data"]["synthetic_size"] = size
    raw["data"]["batch_size"] = 64
    out = REPO / f"experiments/_freebits_ab/{tag}"
    if out.exists():
        shutil.rmtree(out)
    raw["out_dir"] = str(out)
    cfg = Config(raw)
    train_vae_main(cfg)

    run_dir = out / "spatial_vae_cifar10"
    lat = load_latents(run_dir / "latents_train")
    mu = lat["mu"].reshape(-1, lat["mu"].shape[-1]).astype(np.float32)
    z = lat["z"].reshape(-1, lat["z"].shape[-1]).astype(np.float32)
    mu_std = mu.std(axis=0)

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
    idx = rng.integers(0, len(z), size=1024)
    za = z[idx]
    # UNIT perturbations: measures the Jacobian scale itself, independent
    # of how small the latent spread has become
    tangent = rng.normal(size=za.shape).astype(np.float32)
    tangent /= np.linalg.norm(tangent, axis=1, keepdims=True) + 1e-12
    lengths = np.asarray(edge_lengths_riemannian(
        decode_fn, za, za + tangent, batch_size=256))

    # KL trajectory from the engine's metrics log
    val_kl = []
    with open(run_dir / "metrics.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            if "val_kl" in rec:
                val_kl.append(round(float(rec["val_kl"]), 3))

    return {
        "free_bits": free_bits,
        "mu_std_mean": float(mu_std.mean()),
        "mu_std_min": float(mu_std.min()),
        "mu_std_max": float(mu_std.max()),
        "riem_unit_length_mean": float(lengths.mean()),
        "riem_unit_length_p10": float(np.quantile(lengths, 0.1)),
        "val_kl_first": val_kl[0] if val_kl else None,
        "val_kl_last": val_kl[-1] if val_kl else None,
        "val_kl_trajectory": val_kl,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--out", default="docs/runs/cifar-freebits-ab-cpu.json")
    args = ap.parse_args()

    control = run_arm("control", None, args.size, args.epochs)
    print("[ab] control:", json.dumps(control), flush=True)
    fixed = run_arm("freebits", 0.1, args.size, args.epochs)
    print("[ab] freebits:", json.dumps(fixed), flush=True)

    # verdict: the fixed arm must hold materially more latent variance AND
    # a larger decoder Jacobian than the control at equal arch/steps
    res = {
        "probe": {"synthetic_size": args.size, "epochs": args.epochs,
                  "arch": "enc 16/32/64, latent 32, raw-logit MSE, beta 1",
                  "platform": "cpu"},
        "control": control,
        "freebits": fixed,
        "mu_std_ratio": fixed["mu_std_mean"] / max(control["mu_std_mean"],
                                                   1e-12),
        "jacobian_ratio": (fixed["riem_unit_length_mean"]
                           / max(control["riem_unit_length_mean"], 1e-12)),
        "kl_floor_nats": 0.1 * 4 * 4 * 32,
    }
    res["verdict"] = (
        "free-bits holds the posterior open"
        if res["mu_std_ratio"] > 2.0 and fixed["mu_std_mean"] > 1e-2
        else ("control did not collapse at probe scale — A/B inconclusive"
              if control["mu_std_mean"] > 1e-2
              else "free-bits arm ALSO collapsed — recipe insufficient"))
    out = REPO / args.out
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps({k: v for k, v in res.items()
                      if k not in ("control", "freebits")}, indent=2))


if __name__ == "__main__":
    main()
