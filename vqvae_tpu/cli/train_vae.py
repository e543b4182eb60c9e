"""VAE training stage (flat and spatial).

Covers the reference's two CLIs (src/scripts/train_vae.py — spatial — and
src/scripts/train_vanilla_vae.py — flat) with one function; topology comes
from ``cfg.model.topology`` (default flat) or the ``topology`` argument.
Config schema matches the reference YAMLs (configs/<ds>/<variant>/
<distance>/vae.yaml).
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional

from ..config import Config
from ..data import get_data_loaders
from ..models import VAE
from ..train import VAEEngine
from ..utils.logging import MetricsLogger


def train_vae_main(cfg: Config, topology: Optional[str] = None) -> Path:
    seed = int(cfg.get("seed", 42))
    model_cfg = dict(cfg["model"])
    beta = float(model_cfg.pop("beta", 1.0))
    topology = topology or model_cfg.pop("topology", "flat")
    model_cfg.pop("topology", None)

    data_cfg = cfg["data"]
    train_loader, val_loader = get_data_loaders(
        name=str(data_cfg["name"]),
        root=str(data_cfg.get("root", "data")),
        batch_size=int(data_cfg["batch_size"]),
        augment=bool(data_cfg.get("augment", False)),
        seed=seed,
        synthetic_size=data_cfg.get("synthetic_size"),
    )

    if "dtype" in model_cfg:  # e.g. "bfloat16" — bf16 compute, f32 params
        import jax.numpy as jnp

        model_cfg["dtype"] = jnp.dtype(str(model_cfg["dtype"]))
    model = VAE(topology=topology,
                enc_channels=tuple(model_cfg.pop("enc_channels", (32, 64, 128))),
                dec_channels=tuple(model_cfg.pop("dec_channels", (128, 64, 32))),
                **model_cfg)

    # spatial runs nest under a dataset slug (reference train_vae.py:49-52)
    out_dir = Path(cfg["out_dir"])
    if topology == "spatial":
        out_dir = out_dir / f"spatial_vae_{str(data_cfg['name']).lower()}"
    ckpt_dir = out_dir / "checkpoints"

    logger = MetricsLogger(out_dir,
                           run_name=str(cfg.get("run_name", "vae")),
                           experiment_name=str(cfg.get("experiment_name", "vae")),
                           tracking_uri=cfg.get("mlflow_tracking_uri"))
    logger.log_params({
        "seed": seed, "max_epochs": cfg["max_epochs"], "lr": cfg["lr"],
        "weight_decay": cfg.get("weight_decay", 0.0),
        "latent_dim": model.latent_dim, "recon_loss": model.recon_loss,
        "topology": topology,
    })

    scheduler = cfg.get("scheduler")
    use_cosine = bool(scheduler) and (
        not isinstance(scheduler, (dict, Config))
        or scheduler.get("name") == "cosine")
    engine = VAEEngine(
        model,
        lr=float(cfg["lr"]),
        weight_decay=float(cfg.get("weight_decay", 0.0)),
        optimizer=str(cfg.get("optimizer", "adamw")),
        grad_clip_max_norm=float(cfg.get("grad_clip_max_norm", 0.0)),
        cosine_t_max=int(cfg["max_epochs"]) if use_cosine else None,
        steps_per_epoch=len(train_loader),
        seed=seed,
    )
    state = engine.init_state(train_loader.split.images[:1])
    if bool(cfg.get("resume", False)):
        from ..utils.checkpoint import Checkpointer

        ckptr = Checkpointer(ckpt_dir)
        if ckptr.exists("latest"):
            restored = ckptr.restore("latest", target={
                "params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state, "step": 0, "epoch": 0})
            state = state.replace(params=restored["params"],
                                  batch_stats=restored["batch_stats"],
                                  opt_state=restored["opt_state"],
                                  step=restored["step"])
            print(f"[vae] resumed from {ckpt_dir}/latest "
                  f"(epoch {restored['epoch']}, step {restored['step']})")
    engine.train(
        state, train_loader, val_loader,
        num_epochs=int(cfg["max_epochs"]),
        early_stop=int(cfg.get("early_stop", 0)),
        checkpoint_dir=ckpt_dir,
        logger=logger,
        output_dir=out_dir,
        save_latents_flag=bool(cfg.get("save_latents", True)),
        kl_anneal_epochs=int(cfg.get("kl_anneal_epochs", 0)),
        beta=beta,
    )
    logger.end()
    print("Done. Artifacts in:", out_dir)
    return out_dir
