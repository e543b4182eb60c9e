"""Metric-definition parity tests vs torch re-implementations of the
reference formulas, plus a cross-check on real reference artifacts."""
from pathlib import Path

import numpy as np
import pytest

from vqvae_tpu.eval.metrics import (codebook_stats, psnr_np, ssim_simple_np,
                                    psnr, ssim_simple)

torch = pytest.importorskip("torch")


def _torch_psnr(x, y, max_val=1.0):
    xt, yt = torch.tensor(x), torch.tensor(y)
    mse = torch.mean((xt - yt) ** 2).clamp_min(1e-12)
    return float(10.0 * torch.log10(torch.tensor(max_val**2) / mse))


def _torch_ssim_batch(x, y, C1=0.01**2, C2=0.03**2):
    vals = []
    for xi, yi in zip(torch.tensor(x), torch.tensor(y)):
        mu_x, mu_y = xi.mean(), yi.mean()
        sx, sy = xi.var(unbiased=False), yi.var(unbiased=False)
        sxy = ((xi - mu_x) * (yi - mu_y)).mean()
        num = (2 * mu_x * mu_y + C1) * (2 * sxy + C2)
        den = (mu_x**2 + mu_y**2 + C1) + (sx + sy + C2)  # reference '+' quirk
        vals.append(float((num / den).clamp(0, 1)))
    return sum(vals) / len(vals)


@pytest.fixture
def image_pair():
    rng = np.random.RandomState(0)
    x = rng.rand(6, 8, 8, 1).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.1, x.shape).astype(np.float32), 0, 1)
    return x, y


def test_psnr_parity(image_pair):
    x, y = image_pair
    ref = _torch_psnr(x, y)
    assert abs(psnr_np(x, y) - ref) < 1e-4
    assert abs(float(psnr(x, y)) - ref) < 1e-3


def test_ssim_parity_including_quirk(image_pair):
    x, y = image_pair
    ref = _torch_ssim_batch(x, y)
    assert abs(ssim_simple_np(x, y) - ref) < 1e-6
    assert abs(float(ssim_simple(x, y)) - ref) < 1e-5


def test_codebook_stats_tolerates_minus_one():
    codes = np.asarray([0, 1, 1, 2, -1, -1])
    s = codebook_stats(codes, K=4)
    assert s["used"] == 3 and s["dead_codes"] == 1
    p = np.asarray([0.25, 0.5, 0.25])
    assert abs(s["entropy"] - float(-(p * np.log(p)).sum())) < 1e-6


REF_CODES = Path("/root/reference/experiments/euclidean_baseline_fashion_k1024/codes_train.npy")


@pytest.mark.skipif(not REF_CODES.exists(), reason="reference artifacts absent")
def test_codebook_stats_on_reference_artifact():
    """Cross-check our stats implementation on the reference's real
    FashionMNIST K=1024 codes (published usage: all codes used)."""
    codes = np.load(REF_CODES)
    s = codebook_stats(codes, K=1024)
    assert s["used"] == 1024
    assert s["dead_codes"] == 0
    assert 6.0 < s["entropy"] <= np.log(1024) + 1e-6
