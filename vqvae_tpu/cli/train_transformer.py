"""Transformer-prior training stage (reference src/scripts/train_transformer.py)."""
from __future__ import annotations

from pathlib import Path

import numpy as np

from ..config import Config
from ..data.codes import get_code_loaders
from ..models import Transformer
from ..train import TransformerEngine
from ..utils.logging import MetricsLogger


def _resolve_labels_path(p) -> str | None:
    """Accept a labels .pt/.npy, a latents.npz, or a latents dir (labels
    live inside our latents artifact)."""
    if p is None:
        return None
    p = Path(p)
    if p.is_dir():
        if (p / "latents.npz").exists():
            return str(p / "latents.npz")
        if (p / "y.pt").exists():
            return str(p / "y.pt")
    if p.name in ("latents.npz",) or p.suffix in (".npy", ".pt"):
        return str(p)
    return str(p)


def _load_labels_any(path: str | None):
    if path is None:
        return None
    p = Path(path)
    if p.suffix == ".npz":
        with np.load(p) as f:
            return f["y"].astype(np.int32)
    return None  # let CodesDataset's loader handle .npy/.pt


def train_transformer_main(cfg: Config) -> Path:
    data_cfg = cfg["data"]
    model_cfg = dict(cfg["model"])
    train_cfg = cfg["training"]
    seed = int(cfg.get("system", Config({})).get("seed", 42))

    labels_path = _resolve_labels_path(data_cfg.get("labels_path"))
    labels_arr = _load_labels_any(labels_path)
    if labels_arr is not None:
        # write a temp .npy next to codes so the dataset loader stays simple
        tmp = Path(cfg["out"]["dir"]) / "labels_cache.npy"
        tmp.parent.mkdir(parents=True, exist_ok=True)
        np.save(tmp, labels_arr)
        labels_path = str(tmp)

    train_loader, val_loader = get_code_loaders(
        codes_path=str(data_cfg["codes_path"]),
        labels_path=labels_path,
        batch_size=int(data_cfg["batch_size"]),
        vanilla_vae=bool(data_cfg.get("vanilla_vae", False)),
        num_tokens=model_cfg.get("num_tokens"),
        seed=seed,
    )

    if "dtype" in model_cfg:  # e.g. "bfloat16" — bf16 compute, f32 params
        import jax.numpy as jnp

        model_cfg["dtype"] = jnp.dtype(str(model_cfg["dtype"]))
    model = Transformer(**model_cfg)
    out_dir = Path(cfg["out"]["dir"])
    logger = MetricsLogger(out_dir, run_name=str(cfg.get("run_name", "transformer")))
    logger.log_params({**model_cfg, "lr": train_cfg["lr"],
                       "weight_decay": train_cfg.get("weight_decay", 0.0),
                       "epochs": train_cfg["epochs"],
                       "label_smoothing": train_cfg.get("label_smoothing", 0.0)})

    engine = TransformerEngine(
        model,
        lr=float(train_cfg["lr"]),
        weight_decay=float(train_cfg.get("weight_decay", 0.0)),
        grad_clip_max_norm=float(train_cfg.get("grad_clip_max_norm", 0.0)),
        cosine_t_max=int(train_cfg["epochs"]),
        steps_per_epoch=len(train_loader),
        label_smoothing=float(train_cfg.get("label_smoothing", 0.0)),
        seed=seed,
    )
    seq_len = train_loader.x.shape[1]
    state = engine.init_state(seq_len=seq_len,
                              batch_size=int(data_cfg["batch_size"]))
    if bool(cfg.get("resume", False)):
        from ..utils.checkpoint import Checkpointer

        ckptr = Checkpointer(out_dir / "checkpoints")
        if ckptr.exists("latest"):
            # pick the restore target by the checkpoint's actual saved keys
            # (completed stages persist opt_state; mid-stage crash-safe
            # writes are weights-only) — a failed restore then surfaces its
            # real error instead of silently dropping optimizer state
            full = "opt_state" in ckptr.saved_keys("latest")
            if full:
                restored = ckptr.restore("latest", target={
                    "params": state.params, "opt_state": state.opt_state,
                    "step": 0, "epoch": 0})
                state = state.replace(params=restored["params"],
                                      opt_state=restored["opt_state"],
                                      step=restored["step"])
            else:
                restored = ckptr.restore("latest", target={
                    "params": state.params, "step": 0, "epoch": 0})
                state = state.replace(params=restored["params"],
                                      step=restored["step"])
            print(f"[transformer] resumed from epoch {restored['epoch']} "
                  f"({'full state' if full else 'weights-only'})")
    engine.train(state, train_loader, val_loader,
                 num_epochs=int(train_cfg["epochs"]),
                 checkpoint_dir=out_dir / "checkpoints",
                 logger=logger)
    logger.end()
    print("Done. Artifacts in:", out_dir)
    return out_dir
