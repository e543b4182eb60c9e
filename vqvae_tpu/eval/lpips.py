"""LPIPS (AlexNet) perceptual distance in Flax.

The reference uses the ``lpips`` pip package with torch-hub AlexNet weights
(reference src/eval/evaluate_model.py:6, :110). This build environment has
zero network egress and no ``lpips`` install, so the metric is
**weight-gated**: the Flax port below computes LPIPS exactly when given a
weights file, and callers record ``null`` otherwise (a random-init LPIPS
would be meaningless, not approximately right).

Weight sources accepted (checked in order):
1. ``$LPIPS_WEIGHTS`` pointing at an .npz with the arrays named below,
2. ``data/lpips_alex.npz``,
3. a torch ``lpips`` package state_dict (.pt/.pth) — converted on load.

Required arrays: AlexNet features conv kernels ``conv{0..4}/kernel``+bias
(OIHW torch layout accepted and transposed) and linear calibration weights
``lin{0..4}`` (1x1 conv, (C,) after squeeze).

Architecture parity (lpips package, net='alex', version 0.1):
- inputs in [-1, 1], normalized by shift (-0.030, -0.088, -0.188) and
  scale (0.458, 0.448, 0.450),
- AlexNet features: 5 conv stages with ReLU, maxpool after stages 1, 2,
- unit-normalize each stage's channels, squared difference, 1x1 linear
  head per stage, spatial mean, sum over stages.
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet features: (out_ch, kernel, stride, pad, pool_before)
_ALEX = [
    (64, 11, 4, 2, False),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, True),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
]


def _find_weights() -> Path:
    cands = []
    if os.environ.get("LPIPS_WEIGHTS"):
        cands.append(Path(os.environ["LPIPS_WEIGHTS"]))
    cands.append(Path("data/lpips_alex.npz"))
    for c in cands:
        if c.exists():
            return c
    raise FileNotFoundError(
        "LPIPS weights not found (set $LPIPS_WEIGHTS or place "
        "data/lpips_alex.npz); LPIPS will be reported as null")


def _load_weights(path: Path) -> Dict[str, np.ndarray]:
    if path.suffix == ".npz":
        with np.load(path) as f:
            return {k: f[k] for k in f.files}
    # torch lpips state_dict conversion
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    out = {}
    conv_i = 0
    for k, v in sd.items():
        arr = v.numpy()
        if "net" in k and "weight" in k and arr.ndim == 4:
            out[f"conv{conv_i}/kernel"] = arr
        elif "net" in k and "bias" in k:
            out[f"conv{conv_i}/bias"] = arr
            conv_i += 1
        elif "lin" in k and "weight" in k:
            idx = int("".join(ch for ch in k.split(".")[0] if ch.isdigit()))
            out[f"lin{idx}"] = arr.squeeze()
    return out


def _feature_stack(x: jnp.ndarray, w: Dict[str, np.ndarray]) -> List[jnp.ndarray]:
    """x: (B,H,W,3) in [-1,1] -> list of 5 normalized feature maps."""
    h = (x - _SHIFT) / _SCALE
    feats = []
    for i, (out_ch, k, s, p, pool_before) in enumerate(_ALEX):
        if pool_before:
            h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                      (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
        kern = jnp.asarray(w[f"conv{i}/kernel"]).transpose(2, 3, 1, 0)  # OIHW->HWIO
        bias = jnp.asarray(w[f"conv{i}/bias"])
        h = jax.lax.conv_general_dilated(
            h, kern, (s, s), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
        h = jax.nn.relu(h)
        norm = jnp.sqrt(jnp.sum(h**2, axis=-1, keepdims=True) + 1e-10)
        feats.append(h / norm)
    return feats


def lpips_distance(generated: np.ndarray, real: np.ndarray,
                   target_size: int = 64,
                   weights_path: Optional[str | Path] = None) -> float:
    """Mean LPIPS over a batch of (N,H,W,3) [0,1] images (resized to 64px,
    rescaled to [-1,1] — reference preprocess_for_lpips,
    evaluate_model.py:92-102). Raises FileNotFoundError without weights."""
    path = Path(weights_path) if weights_path else _find_weights()
    w = _load_weights(path)

    def prep(imgs):
        x = jnp.asarray(imgs, jnp.float32)
        if x.shape[-1] == 1:  # grayscale -> 3 channels (evaluate_model.py:95-97)
            x = jnp.tile(x, (1, 1, 1, 3))
        x = jax.image.resize(x, (x.shape[0], target_size, target_size, 3),
                             "bilinear")
        return x * 2.0 - 1.0

    fa = _feature_stack(prep(generated), w)
    fb = _feature_stack(prep(real), w)
    total = 0.0
    for i, (a, b) in enumerate(zip(fa, fb)):
        diff2 = (a - b) ** 2
        lin = jnp.asarray(w[f"lin{i}"]).reshape(1, 1, 1, -1)
        total = total + (diff2 * lin).sum(-1).mean(axis=(1, 2))
    return float(jnp.mean(total))
