#!/usr/bin/env python
"""Continuous-vs-quantized reconstruction grids.

Parity with reference demos/codebook_sampling.py: load an experiment's VAE
+ codebook, decode a sample of val latents both continuously and through
their nearest medoids, and save side-by-side grids. Spatial vs vanilla is
auto-detected from the latent shape.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
import _common  # noqa: F401,E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from vqvae_tpu.cli.build_codebook import load_codebook  # noqa: E402
from vqvae_tpu.cli.quality_checks import _load_vae, nearest_medoid_assign  # noqa: E402
from vqvae_tpu.utils.images import save_image_grid  # noqa: E402
from vqvae_tpu.utils.latents import load_latents  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("experiment_dir", type=str)
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    exp = Path(args.experiment_dir)
    model, variables, vae_dir = _load_vae(exp)
    lat = load_latents(vae_dir / "latents_val")
    z = lat["z"]
    rng = np.random.default_rng(args.seed)
    pick = rng.choice(len(z), size=min(args.n, len(z)), replace=False)
    z = z[pick]

    cb = load_codebook(exp / "codebook")
    z_medoid = cb["z_medoid"].astype(np.float32)
    spatial = z.ndim == 4
    if spatial:
        cells = z.reshape(-1, z.shape[-1])
        codes = nearest_medoid_assign(cells, z_medoid)
        zq = z_medoid[codes].reshape(z.shape)
    else:
        codes = nearest_medoid_assign(z, z_medoid)
        zq = z_medoid[codes]

    def decode(zz):
        logits = model.apply(variables, jnp.asarray(zz), method=model.decode)
        return np.asarray(jax.nn.sigmoid(logits))

    x_cont = decode(z)
    x_quant = decode(zq)
    grid = np.concatenate([x_cont, x_quant])
    out = exp / "demo_cont_vs_quant.png"
    save_image_grid(grid, out, nrow=len(z))
    mse = float(np.mean((x_cont - x_quant) ** 2))
    print(f"[demo] {'spatial' if spatial else 'vanilla'} latents; "
          f"cont-vs-quant pixel MSE={mse:.6f}")
    print(f"[demo] saved {out} (top row: continuous, bottom: quantized)")


if __name__ == "__main__":
    main()
