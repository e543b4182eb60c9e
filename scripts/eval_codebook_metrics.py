#!/usr/bin/env python
"""Standalone baseline-VQVAE codebook metric evaluator.

Parity with reference baseline VQVAE/vqvae_cifar10_clean/
eval_codebook_metrics.py:12-80: runs the EMA VQ-VAE over one data split and
reports loss / rec (L1) / vq (commitment) / q_mse / perplexity / usage /
dead plus codebook-embedding norm stats, printing each metric and appending
one row to ``<out_dir>/codebook_eval_<split>.csv``.

TPU-native shape: one jitted step computes every per-batch metric on
device (per-image sums masked by the loader's padding mask) and only the
final accumulated scalars cross back to the host — no per-batch ``.item()``
round-trips like the reference's ``totals[...] += loss.item()`` loop.
"""
import argparse
from pathlib import Path

import _common  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

from vqvae_tpu.config import load_config
from vqvae_tpu.data import get_data_loaders
from vqvae_tpu.models import VQVAE
from vqvae_tpu.models.vqvae_baseline import CodebookState, quantize
from vqvae_tpu.utils.checkpoint import Checkpointer

CSV_HEADER = ["split", "loss", "rec", "vq", "q_mse", "perplex", "usage",
              "dead", "embed_norm_mean", "embed_norm_min", "embed_norm_max"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str,
                    default="configs/baseline_vqvae/config.yaml")
    ap.add_argument("--ckpt", type=str, default=None,
                    help="checkpoint dir (default <out_dir>/checkpoints)")
    ap.add_argument("--split", type=str, choices=["train", "test"],
                    default="test")
    ap.add_argument("--batch_size", type=int, default=None)
    args = ap.parse_args()

    cfg = load_config(args.config)
    base = Path(cfg.get("out_dir", "experiments/baseline_vqvae"))
    ckpt_dir = Path(args.ckpt or (base / "checkpoints"))
    m = cfg["model"]
    beta = float(m.get("beta", 0.25))

    model = VQVAE(in_channels=int(m.get("in_channels", 3)),
                  z_channels=int(m.get("z_channels", 128)),
                  hidden=int(m.get("hidden", 256)),
                  n_res_blocks=int(m.get("n_res_blocks", 2)))
    state = Checkpointer(ckpt_dir).restore("best")
    params = state["params"]
    cb = CodebookState(**{k: jnp.asarray(v) for k, v in state["codebook"].items()})
    n_codes = cb.embed.shape[0]

    batch_size = args.batch_size or int(cfg["train"].get("batch_size", 128))
    train_loader, val_loader = get_data_loaders(
        name=str(cfg["data"].get("name", "CIFAR10")),
        root=str(cfg["data"].get("root", "data")),
        batch_size=batch_size, seed=int(cfg.get("seed", 42)),
        synthetic_size=cfg["data"].get("synthetic_size"))
    loader = train_loader if args.split == "train" else val_loader

    @jax.jit
    def batch_metrics(x, mask):
        """Per-batch metric sums over valid rows (mask handles padding)."""
        z_e = model.apply({"params": params}, x, method=model.encode)
        z_q, idx = quantize(cb, z_e)
        x_rec = model.apply({"params": params}, z_q, method=model.decode)
        w = mask.astype(jnp.float32)                       # (B,)
        n = w.sum()
        # per-image means, then mask-weighted sums (matches the reference's
        # bs-weighted batch averages, eval_codebook_metrics.py:41-56)
        rec = (jnp.abs(x_rec - x).mean(axis=(1, 2, 3)) * w).sum()
        vq = beta * (((z_q - z_e) ** 2).mean(axis=(1, 2, 3)) * w).sum()
        q_mse = (((z_q - z_e) ** 2).mean(axis=(1, 2, 3)) * w).sum()
        # codebook usage over valid cells only
        cells = float(idx.shape[1] * idx.shape[2])
        weights = jnp.broadcast_to(w[:, None, None], idx.shape).reshape(-1)
        hist = jnp.zeros((n_codes,), jnp.float32).at[idx.reshape(-1)].add(weights)
        usage = (hist > 0).astype(jnp.float32).mean()
        p = hist / jnp.maximum(hist.sum(), 1.0)
        perplex = jnp.exp(-(p * jnp.log(jnp.maximum(p, 1e-12))).sum())
        del cells
        return rec, vq, q_mse, perplex * n, usage * n, n

    totals = np.zeros(5, np.float64)
    n_total = 0.0
    for images, _, mask in loader.epoch(0):
        x01 = loader.split.denormalize(images)
        x = jnp.asarray(x01, jnp.float32) * 2.0 - 1.0      # model space [-1,1]
        out = batch_metrics(x, jnp.asarray(mask))
        rec, vq, q_mse, perp_n, usage_n, n = (float(v) for v in out)
        totals += np.array([rec, vq, q_mse, perp_n, usage_n])
        n_total += n
    n_total = max(n_total, 1.0)
    rec, vq, q_mse, perplex, usage = (totals / n_total).tolist()

    norms = np.linalg.norm(np.asarray(cb.embed), axis=1)
    metrics = {
        "loss": rec + vq,
        "rec": rec,
        "vq": vq,
        "q_mse": q_mse,
        "perplex": perplex,
        "usage": usage,
        "dead": 1.0 - usage,
        "embed_norm_mean": float(norms.mean()),
        "embed_norm_min": float(norms.min()),
        "embed_norm_max": float(norms.max()),
    }

    print(f"Split: {args.split}")
    for k, v in metrics.items():
        print(f"{k}: {v:.6f}")

    out_csv = base / f"codebook_eval_{args.split}.csv"
    base.mkdir(parents=True, exist_ok=True)
    write_header = not out_csv.is_file()
    with open(out_csv, "a") as f:
        if write_header:
            f.write(",".join(CSV_HEADER) + "\n")
        row = [args.split] + [f"{metrics[k]}" for k in CSV_HEADER[1:]]
        f.write(",".join(row) + "\n")
    print(f"[eval] appended -> {out_csv}")


if __name__ == "__main__":
    main()
