#!/usr/bin/env python
"""Evaluate the baseline EMA VQ-VAE in pipeline-compatible format.

Parity with reference scripts/evaluate_baseline_simple.py: reconstruction
PSNR/SSIM on the val set, codebook stats (entropy/used/dead/perplexity),
random-code generation grid (8x8), LPIPS when weights are available, and
the same three output files consumed by compare_all_approaches:
evaluation_results.json / metrics.yaml / codebook_health.json.
"""
import argparse
import json
from pathlib import Path

import _common  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from vqvae_tpu.config import load_config
from vqvae_tpu.data import get_data_loaders
from vqvae_tpu.eval.metrics import psnr_np, ssim_simple_np, codebook_stats
from vqvae_tpu.models import VQVAE
from vqvae_tpu.models.vqvae_baseline import CodebookState, quantize
from vqvae_tpu.utils.checkpoint import Checkpointer
from vqvae_tpu.utils.images import save_image_grid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, default="configs/baseline_vqvae/config.yaml")
    ap.add_argument("--ckpt_dir", type=str, default=None)
    ap.add_argument("--out_dir", type=str, default=None)
    ap.add_argument("--max_samples", type=int, default=1000)
    args = ap.parse_args()

    cfg = load_config(args.config)
    base = Path(args.out_dir or cfg.get("out_dir", "experiments/baseline_vqvae"))
    ckpt_dir = Path(args.ckpt_dir or (base / "checkpoints"))
    eval_dir = base / "evaluation"
    eval_dir.mkdir(parents=True, exist_ok=True)

    m = cfg["model"]
    model = VQVAE(in_channels=int(m.get("in_channels", 3)),
                  z_channels=int(m.get("z_channels", 128)),
                  hidden=int(m.get("hidden", 256)),
                  n_res_blocks=int(m.get("n_res_blocks", 2)))
    state = Checkpointer(ckpt_dir).restore("best")
    params = state["params"]
    cb = CodebookState(**{k: jnp.asarray(v) for k, v in state["codebook"].items()})
    n_codes = cb.embed.shape[0]

    _, val_loader = get_data_loaders(
        name=str(cfg["data"].get("name", "CIFAR10")),
        root=str(cfg["data"].get("root", "data")),
        batch_size=128, seed=int(cfg.get("seed", 42)),
        synthetic_size=cfg["data"].get("synthetic_size"))

    @jax.jit
    def recon_step(x):
        z_e = model.apply({"params": params}, x, method=model.encode)
        z_q, idx = quantize(cb, z_e)
        x_rec = model.apply({"params": params}, z_q, method=model.decode)
        return x_rec, idx

    xs, recs, codes = [], [], []
    seen = 0
    for images, _, mask in val_loader.epoch(0):
        x01 = val_loader.split.denormalize(images)
        x = jnp.asarray(x01, jnp.float32) * 2.0 - 1.0
        x_rec, idx = recon_step(x)
        valid = mask > 0
        xs.append(x01[valid])
        recs.append((np.asarray(x_rec)[valid] + 1.0) / 2.0)
        codes.append(np.asarray(idx)[valid])
        seen += int(valid.sum())
        if seen >= args.max_samples:
            break
    x_real = np.concatenate(xs)[:args.max_samples]
    x_rec = np.clip(np.concatenate(recs)[:args.max_samples], 0, 1)
    codes = np.concatenate(codes)[:args.max_samples]

    p = psnr_np(x_real, x_rec)
    s = ssim_simple_np(x_real, x_rec)
    stats = codebook_stats(codes, K=n_codes)
    hist = np.bincount(codes.reshape(-1), minlength=n_codes).astype(np.float64)
    pr = hist / max(hist.sum(), 1.0)
    perplexity = float(np.exp(-(pr * np.log(pr + 1e-12)).sum()))

    # random-code generation (reference evaluate_baseline_simple.py:181-193)
    rng = jax.random.key(int(cfg.get("seed", 42)))
    h = w = int(cfg["data"].get("img_size", 32)) // 4
    rand_idx = jax.random.randint(rng, (64, h, w), 0, n_codes)
    z_q = cb.embed[rand_idx.reshape(-1)].reshape(64, h, w, -1)
    gen = model.apply({"params": params}, z_q, method=model.decode)
    gen01 = (np.asarray(gen) + 1.0) / 2.0
    save_image_grid(gen01, eval_dir / "generated_samples.png", nrow=8)

    lpips_val = None
    try:
        from vqvae_tpu.eval.lpips import lpips_distance

        def to3(v):
            return np.repeat(v, 3, -1) if v.shape[-1] == 1 else v
        lpips_val = lpips_distance(to3(x_rec[:256]), to3(x_real[:256]))
    except (ImportError, FileNotFoundError):
        pass

    results = {
        "recon_psnr": round(p, 4), "recon_ssim": round(s, 4),
        "lpips": round(lpips_val, 4) if lpips_val is not None else None,
        "entropy": round(stats["entropy"], 4),
        "used_codes": stats["used"], "dead_codes": stats["dead_codes"],
        "perplexity": round(perplexity, 2),
        "codebook_size": int(n_codes),
        "samples_evaluated": int(len(x_real)),
    }
    with open(eval_dir / "evaluation_results.json", "w") as f:
        json.dump(results, f, indent=2)
    with open(eval_dir / "metrics.yaml", "w") as f:
        yaml.safe_dump({"PSNR": f"{p:.4f}", "SSIM": f"{s:.4f}",
                        "LPIPS": (f"{lpips_val:.4f}" if lpips_val is not None
                                  else None)}, f)
    usage_percent = 100 * stats["used"] / n_codes
    health = ("EXCELLENT" if stats["entropy"] > 4.5 and usage_percent > 80
              else "GOOD" if stats["entropy"] > 3.5 and usage_percent > 60
              else "MODERATE" if stats["entropy"] > 2.5 and usage_percent > 40
              else "POOR")
    with open(eval_dir / "codebook_health.json", "w") as f:
        json.dump({"entropy": stats["entropy"], "used_codes": stats["used"],
                   "dead_codes": stats["dead_codes"],
                   "usage_percent": usage_percent,
                   "health_assessment": health}, f, indent=2)
    print(f"PSNR {p:.2f} dB, SSIM {s:.4f}, entropy {stats['entropy']:.3f}, "
          f"usage {usage_percent:.1f}% -> {health}")
    print(f"Results saved to {eval_dir}")


if __name__ == "__main__":
    main()
