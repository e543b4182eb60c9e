"""Final evaluation: generated grid vs class-matched real samples.

Parity with reference src/eval/evaluate_model.py:18-182: the generated PNG
grid is sliced back into per-class cells (cell size inferred from the grid
dimensions), real test images are collected class-by-class in the same
order, and PSNR + global-stats SSIM + LPIPS are computed on 3-channel
resized copies. Results land in metrics.yaml and a comparison_grid.png
(first 5 classes, real/generated alternating).

LPIPS runs through the Flax AlexNet port in ``eval.lpips`` when pretrained
weights are available (see that module); otherwise the metric is recorded
as null — this build environment has no network access to fetch torch hub
weights, and a randomly-initialized LPIPS would be meaningless.
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np
import yaml

from ..config import Config
from ..data import load_dataset
from ..eval.metrics import psnr_np, ssim_simple_np
from ..utils.images import load_image, save_image_grid


def _resize(img: np.ndarray, size: int) -> np.ndarray:
    """Bilinear resize (H,W,C) via PIL."""
    from PIL import Image

    if img.shape[0] == size and img.shape[1] == size:
        return img
    pil = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8).squeeze())
    pil = pil.resize((size, size), Image.BILINEAR)
    out = np.asarray(pil, np.float32) / 255.0
    if out.ndim == 2:
        out = out[..., None]
    return out


def _to3ch(img: np.ndarray) -> np.ndarray:
    return np.repeat(img, 3, axis=-1) if img.shape[-1] == 1 else img


def load_generated_grid(path: str | Path, num_images: int, size: int,
                        samples_per_class: int) -> np.ndarray:
    """Slice a grid PNG into (num_images, size, size, 3) cells (reference
    evaluate_model.py:63-89: cell size inferred from grid dims)."""
    grid = load_image(path)
    num_rows = num_images // samples_per_class
    gh, gw = grid.shape[:2]
    cell_h, cell_w = gh // num_rows, gw // samples_per_class
    images = []
    for row in range(num_rows):
        for col in range(samples_per_class):
            cell = grid[row * cell_h:(row + 1) * cell_h,
                        col * cell_w:(col + 1) * cell_w]
            images.append(_to3ch(_resize(cell, size)))
    return np.stack(images)


def load_real_by_class(dataset_name: str, num_images: int, size: int,
                       samples_per_class: int, root: str = "data",
                       synthetic_size: Optional[int] = None) -> np.ndarray:
    """Class-ordered real test images, [0,1] display space, 3-channel."""
    split = load_dataset(dataset_name, root=root, train=False,
                         synthetic_size=synthetic_size)
    imgs01 = split.denormalize(split.images)
    num_classes = num_images // samples_per_class
    out = []
    for cls in range(num_classes):
        idx = np.nonzero(split.labels == cls)[0][:samples_per_class]
        for i in idx:
            out.append(_to3ch(_resize(imgs01[i], size)))
        # pad with zeros if the synthetic subset lacks samples of a class
        for _ in range(samples_per_class - len(idx)):
            out.append(np.zeros((size, size, 3), np.float32))
    return np.stack(out)


def compute_lpips(generated: np.ndarray, real: np.ndarray) -> Optional[float]:
    """Real LPIPS whenever ANY valid weights file is resolvable (see
    eval/lpips.py search order: $LPIPS_WEIGHTS, data/lpips_alex.npz,
    tools/export_lpips_weights.py to produce one); null only with a
    logged reason."""
    try:
        from ..eval.lpips import lpips_distance

        return lpips_distance(generated, real)
    except (ImportError, FileNotFoundError) as err:
        print(f"[evaluate] LPIPS: null — {err} "
              f"(run tools/export_lpips_weights.py on a machine with "
              f"torchvision/lpips weights to enable)")
        return None


def evaluate_model_main(cfg: Config) -> dict:
    dataset_name = cfg.get("dataset_name",
                           cfg.get("data", Config({})).get("dataset_name",
                                                           "fashionmnist"))
    samples_per_class = int(cfg["samples_per_class"])
    num_samples = int(cfg["num_samples"])
    size = int(cfg["image_size"])

    generated = load_generated_grid(cfg["generated_path"], num_samples, size,
                                    samples_per_class)
    real = load_real_by_class(dataset_name, num_samples, size,
                              samples_per_class,
                              root=str(cfg.get("data_root", "data")),
                              synthetic_size=cfg.get("data", Config({})).get(
                                  "synthetic_size"))

    psnr_val = psnr_np(generated, real)
    ssim_val = ssim_simple_np(generated, real)
    lpips_val = compute_lpips(generated, real)

    results = {"PSNR": f"{psnr_val:.4f}", "SSIM": f"{ssim_val:.4f}",
               "LPIPS": f"{lpips_val:.4f}" if lpips_val is not None else None,
               # full-precision twins: a 4-digit "0.0000" hides whether the
               # value is a clipped epsilon or a genuine zero (see
               # docs/runs/cifar10-spatial-geodesic-rootcause.md)
               "PSNR_full": float(psnr_val), "SSIM_full": float(ssim_val),
               "LPIPS_full": (float(lpips_val) if lpips_val is not None
                              else None)}
    print(f"PSNR: {psnr_val:.4f}, SSIM: {ssim_val:.4f}, "
          f"LPIPS: {results['LPIPS']}")

    out_dir = Path(cfg["out_dir"])
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "metrics.yaml", "w") as f:
        yaml.safe_dump(results, f)

    # comparison grid: first 5 classes, 2 samples each, real/gen alternating
    num_classes = num_samples // samples_per_class
    cells = []
    for cls in range(min(num_classes, 5)):
        s = cls * samples_per_class
        for i in range(2):
            cells.append(real[s + i])
            cells.append(generated[s + i])
    save_image_grid(np.stack(cells), out_dir / "comparison_grid.png", nrow=4)
    print(f"Results saved to {out_dir}")
    return {"PSNR": psnr_val, "SSIM": ssim_val, "LPIPS": lpips_val}
