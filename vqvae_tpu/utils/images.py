"""Image grid assembly and PNG IO via PIL (replaces torchvision.utils as
used by the reference's grid savers — reference src/training/engine.py:165-219
and baseline VQVAE/vqvae_cifar10_clean/utils.py:6-34)."""
from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image


def unnormalize_images(x: np.ndarray, dataset_name: str,
                       apply_sigmoid: bool) -> np.ndarray:
    """Dataset-aware logits->display mapping (reference
    evaluate_quantization_loss.py:53-62, evaluate_vae_quality.py:60-71).
    NHWC. CIFAR-10 trained with raw-logit MSE decodes into mean/std-
    normalized space, so display = x*std+mean clipped to [0,1]; sigmoided
    models map through sigmoid; everything else clips."""
    from ..data.datasets import CIFAR10_MEAN, CIFAR10_STD

    if dataset_name.upper() == "CIFAR10" and not apply_sigmoid:
        return np.clip(x * CIFAR10_STD + CIFAR10_MEAN, 0.0, 1.0)
    if apply_sigmoid:
        return 1.0 / (1.0 + np.exp(-x))
    return np.clip(x, 0.0, 1.0)


def make_grid(images: np.ndarray, nrow: int = 8, padding: int = 2,
              pad_value: float = 0.0) -> np.ndarray:
    """Tile (N,H,W,C) [0,1] images into one (GH,GW,C) grid, torchvision-style
    (row-major, ``nrow`` images per row)."""
    images = np.asarray(images, np.float32)
    n, h, w, c = images.shape
    ncol = int(np.ceil(n / nrow))
    grid = np.full((ncol * (h + padding) + padding,
                    nrow * (w + padding) + padding, c), pad_value, np.float32)
    for i in range(n):
        r, col = divmod(i, nrow)
        y = r * (h + padding) + padding
        x = col * (w + padding) + padding
        grid[y:y + h, x:x + w] = images[i]
    return grid


def save_image_grid(images: np.ndarray, path: str | Path, nrow: int = 8,
                    padding: int = 2) -> Path:
    grid = make_grid(np.clip(images, 0.0, 1.0), nrow=nrow, padding=padding)
    return save_image(grid, path)


def save_image(img: np.ndarray, path: str | Path) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arr = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)
    return path


def load_image(path: str | Path) -> np.ndarray:
    """Load a PNG as (H,W,C) float32 in [0,1]."""
    img = np.asarray(Image.open(path), np.float32) / 255.0
    if img.ndim == 2:
        img = img[..., None]
    if img.shape[-1] == 4:  # drop alpha
        img = img[..., :3]
    return img
