#!/usr/bin/env python
"""Build a geodesic spatial codebook (reference src/scripts/build_codebook.py).

Accepts either ``--config codebook.yaml`` or the reference's full explicit
flag set (README.md:137-144 of the reference).
"""
import argparse

import _common  # noqa: F401

from vqvae_tpu.config import Config, load_config
from vqvae_tpu.cli import build_codebook_main

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Build a geodesic spatial codebook.")
    parser.add_argument("--config", type=str, default=None)
    # File Paths
    parser.add_argument("--latents_path", type=str)
    parser.add_argument("--out_dir", type=str)
    parser.add_argument("--vae_ckpt_path", type=str)
    # VAE Config
    parser.add_argument("--in_channels", type=int)
    parser.add_argument("--output_image_size", type=int)
    parser.add_argument("--latent_dim", type=int)
    parser.add_argument("--enc_channels", type=int, nargs="+")
    parser.add_argument("--dec_channels", type=int, nargs="+")
    parser.add_argument("--recon_loss", type=str, default="mse")
    parser.add_argument("--norm_type", type=str, default="batch")
    parser.add_argument("--mse_use_sigmoid", action="store_true")
    # Graph Config
    parser.add_argument("--k", type=int, default=20)
    parser.add_argument("--sym", type=str, default="union")
    # Quantize Config
    parser.add_argument("--K", type=int, default=512)
    parser.add_argument("--init", type=str, default="kpp_parallel")
    parser.add_argument("--seed", type=int, default=42)
    # System Config
    parser.add_argument("--batch_size", type=int, default=512)
    args = parser.parse_args()

    if args.config:
        cfg = load_config(args.config)
    else:
        required = ["latents_path", "out_dir", "vae_ckpt_path", "in_channels",
                    "output_image_size", "latent_dim", "enc_channels",
                    "dec_channels"]
        missing = [r for r in required if getattr(args, r) is None]
        if missing:
            parser.error(f"--config or all of: {missing}")
        cfg = Config({
            "latents_path": args.latents_path,
            "out_dir": args.out_dir,
            "vae_ckpt_path": args.vae_ckpt_path,
            "vae": {
                "in_channels": args.in_channels,
                "output_image_size": args.output_image_size,
                "latent_dim": args.latent_dim,
                "enc_channels": args.enc_channels,
                "dec_channels": args.dec_channels,
                "recon_loss": args.recon_loss,
                "norm_type": args.norm_type,
                "mse_use_sigmoid": args.mse_use_sigmoid,
                "topology": "spatial",
            },
            "graph": {"k": args.k, "sym": args.sym},
            "quantize": {"K": args.K, "init": args.init, "seed": args.seed},
            "system": {"batch_size": args.batch_size},
        })
    build_codebook_main(cfg)
