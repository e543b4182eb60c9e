#!/usr/bin/env python
"""Train the end-to-end EMA VQ-VAE baseline (reference baseline VQVAE/
vqvae_cifar10_clean/train.py CLI parity: config + scalar overrides)."""
import argparse

import _common  # noqa: F401

from vqvae_tpu.config import load_config
from vqvae_tpu.data import get_data_loaders
from vqvae_tpu.models import VQVAE
from vqvae_tpu.train import VQVAEEngine
from vqvae_tpu.utils.logging import MetricsLogger


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, default="configs/baseline_vqvae/config.yaml")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--beta", type=float, default=None)
    ap.add_argument("--n_codes", type=int, default=None)
    ap.add_argument("--ema_decay", type=float, default=None)
    ap.add_argument("--out_dir", type=str, default=None)
    args = ap.parse_args()

    overrides = {}
    if args.epochs is not None:
        overrides.setdefault("train", {})["epochs"] = args.epochs
    if args.batch_size is not None:
        overrides.setdefault("train", {})["batch_size"] = args.batch_size
    if args.lr is not None:
        overrides.setdefault("train", {})["lr"] = args.lr
    if args.beta is not None:
        overrides.setdefault("model", {})["beta"] = args.beta
    if args.n_codes is not None:
        overrides.setdefault("model", {})["n_codes"] = args.n_codes
    if args.ema_decay is not None:
        overrides.setdefault("model", {})["ema_decay"] = args.ema_decay
    if args.out_dir is not None:
        overrides["out_dir"] = args.out_dir
    cfg = load_config(args.config, overrides=overrides)

    train_loader, val_loader = get_data_loaders(
        name=str(cfg["data"].get("name", "CIFAR10")),
        root=str(cfg["data"].get("root", "data")),
        batch_size=int(cfg["train"]["batch_size"]),
        seed=int(cfg.get("seed", 42)),
        synthetic_size=cfg["data"].get("synthetic_size"),
    )

    m = cfg["model"]
    model = VQVAE(in_channels=int(m.get("in_channels", 3)),
                  z_channels=int(m.get("z_channels", 128)),
                  hidden=int(m.get("hidden", 256)),
                  n_res_blocks=int(m.get("n_res_blocks", 2)))
    engine = VQVAEEngine(
        model,
        n_codes=int(m.get("n_codes", 512)),
        beta=float(m.get("beta", 0.25)),
        ema_decay=float(m.get("ema_decay", 0.99)),
        ema_eps=float(m.get("ema_eps", 1e-5)),
        lr=float(cfg["train"]["lr"]),
        weight_decay=float(cfg["train"].get("weight_decay", 0.0)),
        grad_clip=float(cfg["train"].get("grad_clip", 1.0)),
        seed=int(cfg.get("seed", 42)),
    )
    out_dir = str(cfg.get("out_dir", "outputs/baseline_vqvae"))
    logger = MetricsLogger(out_dir, run_name="baseline_vqvae")
    state, cb, bank = engine.init_state(train_loader.split.image_shape)
    engine.train(state, cb, bank, train_loader, val_loader,
                 num_epochs=int(cfg["train"]["epochs"]),
                 checkpoint_dir=f"{out_dir}/checkpoints",
                 logger=logger,
                 output_dir=out_dir,
                 samples_every=int(cfg.get("log", {}).get("samples_every", 1)))
    logger.end()
    print("Done. Artifacts in:", out_dir)


if __name__ == "__main__":
    main()
