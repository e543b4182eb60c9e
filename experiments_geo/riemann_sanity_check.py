#!/usr/bin/env python
"""Riemannian-vs-Euclidean edge-length sanity check.

Parity with reference experiments/geo/riemann_sanity_check.py: on a random
latent sample, compare Euclidean edge lengths against decoder-pullback
Riemannian lengths and report the correlation and length ratios — the
pullback metric should stretch edges non-uniformly (ratio variance > 0)
while staying positively correlated with Euclidean length.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
import _common  # noqa: F401,E402

import jax  # noqa: E402
import numpy as np  # noqa: E402

from vqvae_tpu.models import VAE  # noqa: E402
from vqvae_tpu.ops import edge_lengths_riemannian  # noqa: E402
from vqvae_tpu.ops.riemannian import make_decoder_image_fn  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_edges", type=int, default=2000)
    ap.add_argument("--latent_dim", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    model = VAE(in_channels=1, latent_dim=args.latent_dim, topology="flat",
                output_image_size=28, norm_type="none", recon_loss="mse",
                enc_channels=(32, 64, 128), dec_channels=(128, 64, 32))
    variables = model.init({"params": jax.random.key(args.seed)},
                           np.zeros((1, 28, 28, 1), np.float32))
    decode_fn = make_decoder_image_fn(model, variables, "flat")

    za = rng.normal(size=(args.n_edges, args.latent_dim)).astype(np.float32)
    zb = za + rng.normal(scale=0.1, size=za.shape).astype(np.float32)
    eu = np.linalg.norm(zb - za, axis=1)
    riem = edge_lengths_riemannian(decode_fn, za, zb, batch_size=512)

    ratio = riem / np.maximum(eu, 1e-12)
    corr = float(np.corrcoef(eu, riem)[0, 1])
    print(f"edges={args.n_edges}")
    print(f"euclidean: mean={eu.mean():.4f}")
    print(f"riemannian: mean={riem.mean():.4f}")
    print(f"ratio: mean={ratio.mean():.4f} std={ratio.std():.4f} "
          f"min={ratio.min():.4f} max={ratio.max():.4f}")
    print(f"pearson corr(euclidean, riemannian) = {corr:.4f}")
    assert (riem >= 0).all()
    print("sanity: OK" if corr > 0 and ratio.std() > 1e-6 else
          "sanity: SUSPICIOUS (metric looks degenerate)")


if __name__ == "__main__":
    main()
