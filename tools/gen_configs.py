#!/usr/bin/env python
"""Generate the configs/<dataset>/<variant>/<distance>/ tree.

The layout contract matches the reference (docs/Configuration.md:9-34):
five YAMLs per preset — vae, codebook, transformer, generate, evaluate —
with per-stage paths wired into experiments/<dataset>/<variant>/<distance>.
Values mirror the reference's published configs; sandbox presets shrink
epochs/data for smoke tests and benchmarks.

Run from the repo root:  python tools/gen_configs.py
"""
from __future__ import annotations

from pathlib import Path

import yaml

ROOT = Path(__file__).resolve().parent.parent
DATASET_META = {
    "fashionmnist": {"name": "FashionMNIST", "in_channels": 1, "size": 28},
    "mnist": {"name": "MNIST", "in_channels": 1, "size": 28},
    "cifar10": {"name": "CIFAR10", "in_channels": 3, "size": 32},
}


def preset(dataset, variant, distance, *, sandbox=False, out_root=None):
    meta = DATASET_META[dataset]
    exp = out_root or f"experiments/{dataset}/{variant}/{distance}"
    spatial = variant == "spatial"
    small = sandbox

    enc = [16, 32, 64] if small else [64, 128, 256]
    dec = list(reversed(enc))
    latent_dim = (4 if small else 16) if spatial else (16 if small else 128)
    epochs = 3 if small else 200
    tf_epochs = 3 if small else 200
    batch = 64 if small else 256

    # CIFAR targets are mean/std-normalized (outside (0,1)): a sigmoided-MSE
    # decoder cannot reach them, so recon saturates and the spatial posterior
    # collapses (decoder Jacobian ~0 -> vacuous Riemannian geometry). The
    # reference's CIFAR spatial recipe therefore uses raw-logit MSE and a
    # wider per-cell latent (reference configs/cifar10/spatial/geodesic/
    # vae.yaml:39-45: latent_dim 32, mse_use_sigmoid false) — match it.
    cifar_spatial = spatial and dataset == "cifar10" and not small
    if cifar_spatial:
        latent_dim = 32

    model = {
        "in_channels": meta["in_channels"],
        "output_image_size": meta["size"],
        "latent_dim": latent_dim,
        "enc_channels": enc,
        "dec_channels": dec,
        "recon_loss": "mse",
        "beta": 1.0,
        "norm_type": "batch",
        "mse_use_sigmoid": not cifar_spatial,
        "topology": "spatial" if spatial else "flat",
    }
    if cifar_spatial:
        # the reference recipe (beta=1, no anneal, no free bits, raw-logit
        # MSE) posterior-collapses on CIFAR — measured on both sides, see
        # docs/runs/cifar10-spatial-geodesic-rootcause.md. 0.1 nats/dim
        # over the 4x4x32 grid floors KL at 51.2 nats; spatial_free_bits
        # is this framework's opt-in lever (None = reference parity).
        model["spatial_free_bits"] = 0.1
    if not spatial:
        model.update({"free_bits": 0.25, "capacity_max": 25.0,
                      "capacity_anneal_steps": 100_000,
                      "capacity_mode": "abs"})

    data = {"root": "./data", "name": meta["name"], "batch_size": batch,
            "num_workers": 4, "pin_memory": True, "persistent_workers": True,
            "augment": False}
    if small:
        data["synthetic_size"] = 2048

    vae = {
        "seed": 42, "device": "auto", "max_epochs": epochs,
        "lr": 1e-3 if spatial else 3e-4,
        "weight_decay": 1e-5 if spatial else 1e-4,
        "early_stop": 0 if small else 20,
        "kl_anneal_epochs": 0 if spatial else (0 if small else 50),
        "optimizer": "adamw",
        "scheduler": {"name": "cosine", "t_max": epochs},
        "grad_clip_max_norm": 1.0,
        "out_dir": f"{exp}/vae",
        "save_latents": True,
        "mlflow_tracking_uri": None,
        "experiment_name": f"{meta['name']}_{variant}_{distance}",
        "run_name": f"{variant}_vae_{dataset}",
        "data": data,
        "model": model,
    }

    vae_dir = (f"{exp}/vae/spatial_vae_{dataset}" if spatial else f"{exp}/vae")
    latents = f"{vae_dir}/latents_train"
    ckpt = f"{vae_dir}/checkpoints/best"
    K = 128 if small else 512
    kpp_init = "kpp_parallel"

    vae_arch = {k: model[k] for k in ("in_channels", "output_image_size",
                                      "latent_dim", "enc_channels",
                                      "dec_channels", "recon_loss",
                                      "norm_type", "mse_use_sigmoid",
                                      "topology")}
    if spatial:
        codebook = {
            "builder": "spatial",
            "latents_path": latents,
            "vae_ckpt_path": ckpt,
            "out_dir": f"{exp}/codebook",
            "vae": vae_arch,
            "graph": {"k": 10 if small else 20, "sym": "union"},
            "quantize": {"K": K, "init": kpp_init, "seed": 42},
            "system": {"batch_size": 4096},
        }
    else:
        codebook = {
            "builder": ("legacy_riemannian" if distance == "geodesic"
                        else "legacy"),
            "latents_path": latents,
            "latents_key": "mu",
            "vae_ckpt_path": ckpt,
            "out_dir": f"{exp}/codebook",
            "vae": vae_arch,
            "graph": {"k": 10 if small else 20, "metric": "euclidean",
                      "sym": "union", "mode": "distance"},
            "quantize": {"K": K, "init": kpp_init, "seed": 42},
            "seed": 42,
        }
        if distance == "geodesic":
            codebook["riemannian"] = {"mode": "subset", "max_edges": 5000,
                                      "batch_size": 4096}

    num_tokens = K if spatial else K + 1  # vanilla adds a BOS token
    seq_len = 16 if spatial else 2
    tf_model = {
        "num_classes": 10,
        "num_tokens": num_tokens,
        "embed_dim": (64 if small else 256) if spatial else (128 if small else 512),
        "n_layers": (2 if small else 4) if spatial else (2 if small else 8),
        "n_head": 4 if spatial else (4 if small else 8),
        "max_seq_len": seq_len,
        "dropout": 0.1,
    }
    transformer = {
        "system": {"seed": 42, "device": "auto"},
        "data": {"codes_path": f"{exp}/codebook/codes.npy",
                 "labels_path": latents,
                 "batch_size": batch, "num_workers": 0,
                 "vanilla_vae": not spatial},
        "training": {"epochs": tf_epochs, "lr": 3e-4, "weight_decay": 0.01,
                     "label_smoothing": 0.1},
        "out": {"dir": f"{exp}/transformer"},
        "run_name": f"transformer_{variant}_{distance}",
        "model": tf_model,
    }

    spc = 4 if small else 10
    generate = {
        "transformer_ckpt_path": f"{exp}/transformer/checkpoints/best",
        "vae_ckpt_path": ckpt,
        "codebook_path": f"{exp}/codebook/codebook.npz",
        "transformer": tf_model,
        "vae": vae_arch,
        "dataset_name": dataset,
        "num_samples": spc * 10,
        "temperature": 1.0,
        "top_k": 50,
        "class_labels": list(range(10)),
        "samples_per_class": spc,
        "output_dir": f"{exp}/evaluation",
        "output_filename": "generated_samples.png",
        "seed": 42,
        "vanilla_vae": not spatial,
    }

    evaluate = {
        "data": {"dataset_name": dataset, "test_size": 1000,
                 **({"synthetic_size": 512} if small else {})},
        "dataset_name": dataset,
        "generated_path": f"{exp}/evaluation/generated_samples.png",
        "num_samples": spc * 10,
        "samples_per_class": spc,
        "image_size": meta["size"],
        "metrics": {"calculate_psnr": True, "calculate_ssim": True,
                    "calculate_lpips": True},
        "out_dir": f"{exp}/evaluation",
        "metrics_file": "evaluation_metrics.json",
        "system": {"seed": 42},
    }
    quality = {
        "experiment": exp,
        "dataset": dataset,
        **({"synthetic_size": 512} if small else {}),
    }
    return {"vae": vae, "codebook": codebook, "quality": quality,
            "transformer": transformer, "generate": generate,
            "evaluate": evaluate}


def write(preset_dir: Path, stages: dict):
    preset_dir.mkdir(parents=True, exist_ok=True)
    for stage, cfg in stages.items():
        with open(preset_dir / f"{stage}.yaml", "w") as f:
            yaml.safe_dump(cfg, f, sort_keys=False)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default=str(ROOT / "configs"),
                    help="output root (default: the repo's configs/)")
    args = ap.parse_args()
    out_root = Path(args.out)

    combos = [
        ("fashionmnist", "spatial", "geodesic"),
        ("fashionmnist", "vanilla", "euclidean"),
        ("fashionmnist", "vanilla", "geodesic"),
        ("cifar10", "spatial", "geodesic"),
        ("cifar10", "vanilla", "euclidean"),
        ("cifar10", "vanilla", "geodesic"),
        ("mnist", "vanilla", "euclidean"),
    ]
    for ds, variant, dist in combos:
        write(out_root / ds / variant / dist,
              preset(ds, variant, dist))
    # sandbox presets (tiny synthetic, smoke/bench)
    write(out_root / "sandbox-fashion" / "euclidean",
          preset("fashionmnist", "vanilla", "euclidean", sandbox=True,
                 out_root="experiments/sandbox-fashion/euclidean"))
    write(out_root / "sandbox-fashion" / "geodesic",
          preset("fashionmnist", "spatial", "geodesic", sandbox=True,
                 out_root="experiments/sandbox-fashion/geodesic"))
    print("configs generated")


if __name__ == "__main__":
    main()
