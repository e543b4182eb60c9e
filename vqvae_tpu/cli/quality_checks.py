"""Quality-gate evaluators: VAE quality, quantization loss, codebook health.

Ports of the reference's three standalone checkers with identical metric
definitions, tier thresholds and JSON outputs:

- ``evaluate_vae_quality_main`` — decode z and mu from the val latents,
  PSNR/SSIM of x(z) vs x(mu); tiers >20 excellent / >15 good / >10
  acceptable / else poor -> RETRAIN, non-zero exit gates the pipeline
  (reference src/eval/evaluate_vae_quality.py:78-177).
- ``evaluate_quantization_loss_main`` — real vs continuous vs quantized
  reconstructions, 6 PSNR/SSIM pairs, EXCELLENT/GOOD/MODERATE/HIGH verdict
  on continuous-vs-quantized PSNR (reference evaluate_quantization_loss
  .py:65-187).
- ``evaluate_codebook_health_main`` — entropy/used/dead on val nearest-
  medoid assignments + cont-vs-quant PSNR/SSIM; EXCELLENT needs
  entropy>4.5 & usage>80% (reference evaluate_codebook_health.py:104-124).

Device work (decoding sweeps, the blockwise ||a||^2+||b||^2-2ab argmin
assignment) is jitted; the assignment matmul is the same kernel family as
ops.knn.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.datasets import load_dataset
from ..utils.images import unnormalize_images
from ..eval.metrics import psnr_np, ssim_simple_np
from ..utils.checkpoint import load_vae_from_checkpoint
from ..utils.latents import load_latents
from .build_codebook import load_codebook


def nearest_medoid_assign(z: np.ndarray, z_medoid: np.ndarray,
                          batch_size: int = 8192) -> np.ndarray:
    """Nearest-medoid assignment via the fused Pallas kernel (distance
    matmul + argmin reduced in VMEM; ops/pallas_assign.py) — the TPU
    replacement for the reference's blockwise torch matmul
    (evaluate_quantization_loss.py:37-50)."""
    from ..ops.pallas_assign import nearest_codes

    idx, _ = nearest_codes(z, z_medoid, tile=min(batch_size, 8192))
    return idx




def _decode_sweep(model, variables, z: np.ndarray, dataset_name: str,
                  batch_size: int = 512) -> np.ndarray:
    apply_sigmoid = model.apply_sigmoid

    @jax.jit
    def dec(zb):
        return model.apply(variables, zb, method=model.decode)

    outs = []
    for i in range(0, len(z), batch_size):
        logits = np.asarray(dec(jnp.asarray(z[i:i + batch_size], jnp.float32)))
        outs.append(unnormalize_images(logits, dataset_name, apply_sigmoid))
    return np.concatenate(outs)


def _load_vae(experiment_dir: Path, vae_subdir: str = "vae"):
    ckpt_dir = experiment_dir / vae_subdir / "checkpoints"
    if not ckpt_dir.exists():  # spatial slug layout
        hits = list((experiment_dir / vae_subdir).glob("*/checkpoints"))
        if not hits:
            raise FileNotFoundError(f"no checkpoints under {experiment_dir / vae_subdir}")
        ckpt_dir = hits[0]
    model, variables = load_vae_from_checkpoint(ckpt_dir, "best")
    return model, variables, ckpt_dir.parent


def assess_quality(psnr_value: float, ssim_value: float) -> Tuple[str, bool]:
    if psnr_value > 20:
        return "excellent", True
    if psnr_value > 15:
        return "good", True
    if psnr_value > 10:
        return "acceptable", True
    return "poor", False


def evaluate_vae_quality_main(experiment: str | Path, dataset: str = "fashionmnist",
                              max_samples: int = 1000,
                              batch_size: int = 512) -> int:
    experiment_dir = Path(experiment)
    model, variables, vae_dir = _load_vae(experiment_dir)
    lat = load_latents(vae_dir / "latents_val")
    z, mu = lat["z"][:max_samples], lat["mu"][:max_samples]

    x_from_z = _decode_sweep(model, variables, z, dataset, batch_size)
    x_from_mu = _decode_sweep(model, variables, mu, dataset, batch_size)

    p = psnr_np(x_from_z, x_from_mu)
    s = ssim_simple_np(x_from_z, x_from_mu)
    quality, proceed = assess_quality(p, s)

    # Posterior-collapse detector (beyond the reference gate): x(z) vs x(mu)
    # measures latent-noise sensitivity, so a decoder that IGNORES its latent
    # scores a perfect PSNR — the reference's CIFAR spatial run sails through
    # at "excellent" exactly this way. A collapsed posterior has mu carrying
    # no information: per-dim variance of mu across samples ~ 0 everywhere.
    mu_flat = np.asarray(mu, np.float32).reshape(len(mu), -1)
    mu_var_max = float(mu_flat.var(axis=0).max()) if len(mu_flat) > 1 else 1.0
    collapsed = mu_var_max < 1e-2
    if collapsed:
        print(f"WARNING: posterior collapse suspected — max per-dim var(mu) "
              f"= {mu_var_max:.2e} (< 1e-2). The {p:.0f} dB x(z)-vs-x(mu) "
              f"PSNR only means the decoder ignores z; downstream geodesic "
              f"geometry will be vacuous. Rating capped at POOR.")
        quality, proceed = "poor", False

    print(f"PSNR: {p:.2f} dB, SSIM: {s:.4f}")
    print(f"Quality: {quality.upper()}")
    print(f"Recommendation: {'PROCEED' if proceed else 'RETRAIN'}")

    results = {
        "dataset": dataset, "psnr_db": float(p), "ssim": float(s),
        "quality_rating": quality,
        "recommendation": "proceed" if proceed else "retrain",
        "samples_evaluated": int(len(x_from_mu)),
        "mu_variance_max": mu_var_max,
        "posterior_collapse_suspected": bool(collapsed),
    }
    out = vae_dir / "vae_quality_assessment.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"Results saved to {out}")
    return 0 if proceed else 1


def _load_codebook_and_codes(experiment_dir: Path, z_val: np.ndarray
                             ) -> Tuple[np.ndarray, np.ndarray]:
    cb = load_codebook(experiment_dir / "codebook")
    z_medoid = cb["z_medoid"].astype(np.float32)
    codes = nearest_medoid_assign(z_val.reshape(len(z_val), -1)
                                  if z_val.ndim == 2 else
                                  z_val.reshape(-1, z_val.shape[-1]),
                                  z_medoid)
    return z_medoid, codes


def evaluate_quantization_loss_main(experiment: str | Path,
                                    dataset: str = "fashionmnist",
                                    batch_size: int = 512,
                                    max_samples: int = 1000,
                                    synthetic_size: Optional[int] = None) -> int:
    experiment_dir = Path(experiment)
    model, variables, vae_dir = _load_vae(experiment_dir)
    lat = load_latents(vae_dir / "latents_val")
    z_val = lat["z"][:max_samples]
    flat = z_val.ndim == 2

    cb = load_codebook(experiment_dir / "codebook")
    z_medoid = cb["z_medoid"].astype(np.float32)
    if flat:
        codes = nearest_medoid_assign(z_val, z_medoid)
        zq_val = z_medoid[codes]
    else:
        cells = z_val.reshape(-1, z_val.shape[-1])
        codes = nearest_medoid_assign(cells, z_medoid)
        zq_val = z_medoid[codes].reshape(z_val.shape)

    split = load_dataset(dataset, train=False, synthetic_size=synthetic_size)
    x_real = split.denormalize(split.images[:len(z_val)])
    if x_real.shape[-1] != model.in_channels:
        if model.in_channels == 1:
            x_real = x_real.mean(-1, keepdims=True)
        else:
            x_real = np.repeat(x_real, 3, axis=-1)

    x_cont = _decode_sweep(model, variables, z_val, dataset, batch_size)
    x_quant = _decode_sweep(model, variables, zq_val, dataset, batch_size)
    n = min(len(x_real), len(x_cont))
    x_real, x_cont, x_quant = x_real[:n], x_cont[:n], x_quant[:n]

    metrics = {
        "dataset": dataset, "samples_evaluated": int(n),
        "codebook_size": int(z_medoid.shape[0]),
        "psnr_real_vs_continuous": round(psnr_np(x_real, x_cont), 6),
        "psnr_real_vs_quantized": round(psnr_np(x_real, x_quant), 6),
        "psnr_continuous_vs_quantized": round(psnr_np(x_cont, x_quant), 6),
        "ssim_real_vs_continuous": round(ssim_simple_np(x_real, x_cont), 6),
        "ssim_real_vs_quantized": round(ssim_simple_np(x_real, x_quant), 6),
        "ssim_continuous_vs_quantized": round(ssim_simple_np(x_cont, x_quant), 6),
    }
    cq = metrics["psnr_continuous_vs_quantized"]
    assessment = ("EXCELLENT" if cq > 25 else "GOOD" if cq > 20
                  else "MODERATE" if cq > 15 else "HIGH")
    print(f"Real vs Continuous: PSNR {metrics['psnr_real_vs_continuous']:.2f} dB")
    print(f"Continuous vs Quantized: PSNR {cq:.2f} dB")
    print(f"Quantization loss: {assessment}")

    out_dir = experiment_dir / "evaluation"
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "quantization_analysis.json", "w") as f:
        json.dump(metrics, f, indent=2)
    print(f"Results saved to {out_dir}/quantization_analysis.json")
    return 0


def evaluate_codebook_health_main(experiment: str | Path,
                                  dataset: str = "fashionmnist",
                                  batch_size: int = 512) -> int:
    from ..eval.metrics import codebook_stats

    experiment_dir = Path(experiment)
    model, variables, vae_dir = _load_vae(experiment_dir)
    lat = load_latents(vae_dir / "latents_val")
    z_val = lat["z"]
    flat = z_val.ndim == 2

    cb = load_codebook(experiment_dir / "codebook")
    z_medoid = cb["z_medoid"].astype(np.float32)
    if flat:
        codes = nearest_medoid_assign(z_val, z_medoid)
        zq_val = z_medoid[codes]
    else:
        cells = z_val.reshape(-1, z_val.shape[-1])
        codes = nearest_medoid_assign(cells, z_medoid)
        zq_val = z_medoid[codes].reshape(z_val.shape)

    x_cont = _decode_sweep(model, variables, z_val, dataset, batch_size)
    x_quant = _decode_sweep(model, variables, zq_val, dataset, batch_size)

    p = psnr_np(x_cont, x_quant)
    s = ssim_simple_np(x_cont, x_quant)
    stats = codebook_stats(codes, K=z_medoid.shape[0])
    usage_percent = 100 * stats["used"] / z_medoid.shape[0]
    health = ("EXCELLENT" if stats["entropy"] > 4.5 and usage_percent > 80
              else "GOOD" if stats["entropy"] > 3.5 and usage_percent > 60
              else "MODERATE" if stats["entropy"] > 2.5 and usage_percent > 40
              else "POOR")
    print(f"PSNR: {p:.2f} dB, SSIM: {s:.4f}")
    print(f"Entropy: {stats['entropy']:.3f}, Usage: {usage_percent:.1f}%")
    print(f"Health: {health}")

    out_dir = experiment_dir / "evaluation"
    out_dir.mkdir(parents=True, exist_ok=True)
    results = {
        "dataset": dataset, "samples_evaluated": int(len(x_cont)),
        "codebook_size": int(z_medoid.shape[0]),
        "psnr_continuous_vs_quantized": round(float(p), 6),
        "ssim_continuous_vs_quantized": round(float(s), 6),
        "entropy": round(stats["entropy"], 6),
        "used_codes": stats["used"],
        "dead_codes": stats["dead_codes"],
        "usage_percent": round(usage_percent, 2),
        "health_assessment": health,
    }
    with open(out_dir / "codebook_health.json", "w") as f:
        json.dump(results, f, indent=2)
    print(f"Results saved to {out_dir}/codebook_health.json")
    return 0
