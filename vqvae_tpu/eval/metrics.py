"""Image-quality and codebook-health metrics.

Exact parity with the reference metric definitions (reference
src/eval/metrics.py) because the published numbers depend on their quirks:

- ``psnr``: 10 log10(max^2 / mse) over the whole batch, inputs in [0, 1].
- ``ssim_simple``: a **global-statistics** SSIM (no sliding window),
  computed per image then averaged. NOTE the reference's batch branch uses
  ``den = (mu_x^2 + mu_y^2 + C1) + (sigma_x + sigma_y + C2)`` — a ``+``
  where the canonical formula (and its own single-image branch) uses ``*``
  (reference metrics.py:26 vs :38). Published SSIMs were produced by the
  batch branch, so we reproduce both branches verbatim.
- ``codebook_stats``: entropy / dead / used tolerating -1 sentinel codes.

JAX versions run inside jitted eval steps (masked for padded batches);
``*_np`` twins serve the host-side evaluation suite.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def psnr(x: jax.Array, y: jax.Array, max_val: float = 1.0,
         mask: Optional[jax.Array] = None) -> jax.Array:
    """Batch PSNR in dB; ``mask`` (B,) excludes padded rows from the MSE."""
    se = (x - y) ** 2
    if mask is not None:
        axes = tuple(range(1, x.ndim))
        per = se.sum(axes)
        n_per = np.prod(x.shape[1:])
        mse = (per * mask).sum() / jnp.maximum(mask.sum() * n_per, 1.0)
    else:
        mse = se.mean()
    mse = jnp.maximum(mse, 1e-12)
    return 10.0 * jnp.log10(max_val**2 / mse)


def _ssim_image(xi: jax.Array, yi: jax.Array, C1: float, C2: float) -> jax.Array:
    mu_x, mu_y = xi.mean(), yi.mean()
    var_x = ((xi - mu_x) ** 2).mean()
    var_y = ((yi - mu_y) ** 2).mean()
    cov = ((xi - mu_x) * (yi - mu_y)).mean()
    num = (2 * mu_x * mu_y + C1) * (2 * cov + C2)
    # reference batch-branch quirk: '+' between the two denominator terms
    den = (mu_x**2 + mu_y**2 + C1) + (var_x + var_y + C2)
    return jnp.clip(num / den, 0.0, 1.0)


def ssim_simple(x: jax.Array, y: jax.Array, C1: float = 0.01**2,
                C2: float = 0.03**2, mask: Optional[jax.Array] = None) -> jax.Array:
    """Global-statistics SSIM, per-image then averaged (reference batch
    branch, metrics.py:11-31)."""
    if x.ndim == 4:
        per = jax.vmap(lambda a, b: _ssim_image(a, b, C1, C2))(x, y)
        if mask is not None:
            return (per * mask).sum() / jnp.maximum(mask.sum(), 1.0)
        return per.mean()
    # single-image branch (reference metrics.py:33-39: '*' in denominator)
    mu_x, mu_y = x.mean(), y.mean()
    var_x = ((x - mu_x) ** 2).mean()
    var_y = ((y - mu_y) ** 2).mean()
    cov = ((x - mu_x) * (y - mu_y)).mean()
    num = (2 * mu_x * mu_y + C1) * (2 * cov + C2)
    den = (mu_x**2 + mu_y**2 + C1) * (var_x + var_y + C2)
    return jnp.clip(num / den, 0.0, 1.0)


def codebook_stats(codes: np.ndarray, K: int) -> Dict:
    """Entropy / dead / used over code assignments; -1 codes are ignored
    (reference metrics.py:42-54)."""
    codes = np.asarray(codes).reshape(-1).astype(np.int64)
    valid = codes >= 0
    if valid.any():
        hist = np.bincount(codes[valid], minlength=K).astype(np.float64)
    else:
        hist = np.zeros(K, np.float64)
    p = np.maximum(hist / max(hist.sum(), 1e-12), 1e-12)
    entropy = float(-(p * np.log(p)).sum())
    return {
        "entropy": entropy,
        "dead_codes": int((hist == 0).sum()),
        "used": int((hist > 0).sum()),
    }


# ---- numpy twins for the host-side evaluation suite ----------------------

def psnr_np(x: np.ndarray, y: np.ndarray, max_val: float = 1.0) -> float:
    mse = max(float(np.mean((np.asarray(x, np.float64) - np.asarray(y, np.float64)) ** 2)), 1e-12)
    return float(10.0 * np.log10(max_val**2 / mse))


def ssim_simple_np(x: np.ndarray, y: np.ndarray, C1: float = 0.01**2,
                   C2: float = 0.03**2) -> float:
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    if x.ndim == 4:
        vals = []
        for xi, yi in zip(x, y):
            mu_x, mu_y = xi.mean(), yi.mean()
            var_x, var_y = xi.var(), yi.var()
            cov = ((xi - mu_x) * (yi - mu_y)).mean()
            num = (2 * mu_x * mu_y + C1) * (2 * cov + C2)
            den = (mu_x**2 + mu_y**2 + C1) + (var_x + var_y + C2)
            vals.append(float(np.clip(num / den, 0, 1)))
        return float(np.mean(vals))
    mu_x, mu_y = x.mean(), y.mean()
    var_x, var_y = x.var(), y.var()
    cov = ((x - mu_x) * (y - mu_y)).mean()
    num = (2 * mu_x * mu_y + C1) * (2 * cov + C2)
    den = (mu_x**2 + mu_y**2 + C1) * (var_x + var_y + C2)
    return float(np.clip(num / den, 0, 1))
