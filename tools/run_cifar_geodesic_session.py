#!/usr/bin/env python
"""One-process CIFAR spatial-geodesic session (VERDICT r3 item 3).

Chains, inside a single TPU client (init is 3-5 min per process here):
  1. the posterior-collapse probe on the regenerated recipe
     (tools/check_cifar_collapse.py logic, reduced scale),
  2. if the probe is clean, the full configs/cifar10/spatial/geodesic
     pipeline (all five stages),
  3. the path-dilation experiment on the resulting artifacts
     (experiments_geo/run_riemann_experiments.py logic) — the build's
     analog of the reference's R=1.152 sanity number
     (reference docs/geo/riemann_graph_effect.md:47-66).

Usage:
  python tools/run_cifar_geodesic_session.py [--probe-size 8192]
      [--probe-epochs 30] [--skip-probe] [--skip-pipeline]
"""
from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))
import _common  # noqa: F401,E402

import numpy as np  # noqa: E402


def run_probe(size: int, epochs: int) -> dict:
    from vqvae_tpu.config import Config, load_config
    from vqvae_tpu.cli.train_vae import train_vae_main
    from vqvae_tpu.utils.latents import load_latents
    from vqvae_tpu.utils.checkpoint import load_vae_from_checkpoint
    from vqvae_tpu.ops import edge_lengths_riemannian
    from vqvae_tpu.ops.riemannian import make_decoder_image_fn

    preset = REPO / "configs/cifar10/spatial/geodesic"
    raw = load_config(preset / "vae.yaml").to_dict()
    raw["max_epochs"] = epochs
    raw["early_stop"] = 0
    raw["scheduler"]["t_max"] = epochs
    raw["data"]["synthetic_size"] = size
    out = REPO / "experiments/_cifar_collapse_probe"
    raw["out_dir"] = str(out)
    cfg = Config(raw)
    train_vae_main(cfg)

    run_dir = out / "spatial_vae_cifar10"
    lat = load_latents(run_dir / "latents_train")
    z = lat["z"].reshape(-1, lat["z"].shape[-1]).astype(np.float32)
    per_dim_std = z.std(axis=0)

    vae_cfg = {k: cfg["model"][k] for k in
               ("in_channels", "output_image_size", "latent_dim",
                "enc_channels", "dec_channels", "norm_type", "topology")}
    vae_cfg["enc_channels"] = tuple(vae_cfg["enc_channels"])
    vae_cfg["dec_channels"] = tuple(vae_cfg["dec_channels"])
    model, variables = load_vae_from_checkpoint(
        run_dir / "checkpoints", "best", config=vae_cfg,
        recon_loss=cfg["model"].get("recon_loss", "mse"),
        mse_use_sigmoid=bool(cfg["model"].get("mse_use_sigmoid", True)))
    decode_fn = make_decoder_image_fn(model, variables, "spatial")
    rng = np.random.default_rng(0)
    idx = rng.integers(0, len(z), size=2048)
    za = z[idx]
    zb = za + rng.normal(0, per_dim_std.mean() + 1e-8,
                         size=za.shape).astype(np.float32)
    lengths = np.asarray(
        edge_lengths_riemannian(decode_fn, za, zb, batch_size=512))
    res = {
        "latent_std_mean": float(per_dim_std.mean()),
        "latent_std_min": float(per_dim_std.min()),
        "riem_length_mean": float(lengths.mean()),
        "riem_length_p90": float(np.quantile(lengths, 0.9)),
        "collapsed": bool(per_dim_std.mean() < 1e-3
                          or lengths.mean() < 1e-6),
    }
    print("[session] probe:", json.dumps(res), flush=True)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe-size", type=int, default=8192)
    ap.add_argument("--probe-epochs", type=int, default=30)
    ap.add_argument("--skip-probe", action="store_true")
    ap.add_argument("--skip-pipeline", action="store_true")
    args = ap.parse_args()

    t0 = time.time()
    if not args.skip_probe:
        res = run_probe(args.probe_size, args.probe_epochs)
        if res["collapsed"]:
            print("[session] recipe still collapses — NOT running the "
                  "full pipeline", flush=True)
            sys.exit(2)

    if not args.skip_pipeline:
        from vqvae_tpu.cli.pipeline import run_pipeline
        timings = run_pipeline(
            str(REPO / "configs/cifar10/spatial/geodesic"))
        out = REPO / "experiments/cifar10-spatial-geodesic-timings.json"
        with open(out, "w") as f:
            json.dump(timings, f, indent=2)
        print("[session] pipeline timings:", json.dumps(timings),
              flush=True)

    # Dilation ratio runs in a subprocess (it is host/Dijkstra work and
    # keeps its own artifact contract at experiments/<dir>/
    # riemann_graph_effect.json).
    proc = subprocess.run(
        [sys.executable, str(REPO / "experiments_geo/run_riemann_experiments.py"),
         str(REPO / "experiments/cifar10/spatial/geodesic")],
        env={**__import__("os").environ, "VQVAE_TPU_PLATFORM": "cpu"},
        cwd=str(REPO))
    print(f"[session] dilation step exit={proc.returncode}; "
          f"total {time.time()-t0:.1f}s", flush=True)
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
