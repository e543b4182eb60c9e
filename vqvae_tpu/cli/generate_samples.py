"""Class-conditional sample generation (reference src/scripts/generate_samples.py).

Semantics parity: per-class autoregressive sampling with temperature +
top-k; vanilla mode prompts with BOS = num_tokens-1 and keeps the first
generated code; spatial mode starts from a random first token and samples
the remaining 15 grid cells; codes index into ``z_medoid`` and the grid is
decoded through the dataset-aware display mapping (sigmoid for
sigmoid-trained losses, CIFAR mean/std denormalization for raw-logit MSE;
the reference's generate_samples.py:97 hard-codes sigmoid — a bug). One PNG grid with ``samples_per_class``
images per row.

TPU improvement: sampling runs with a KV cache under one jit (the
reference recomputes the full prefix per token).
"""
from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models import Transformer
from ..train.transformer_engine import sample_autoregressive
from ..utils.checkpoint import Checkpointer, load_vae_from_checkpoint
from ..utils.images import save_image_grid
from .build_codebook import load_codebook


def generate_samples_main(cfg: Config) -> Path:
    seed = int(cfg.get("seed", 42))
    rng = jax.random.key(seed)

    tf_cfg = dict(cfg["transformer"])
    transformer = Transformer(**tf_cfg)
    tf_ckpt = Path(cfg["transformer_ckpt_path"])
    tf_state = Checkpointer(tf_ckpt.parent).restore(tf_ckpt.name)
    tf_params = tf_state["params"]

    vae_cfg = dict(cfg["vae"])
    is_vanilla = bool(cfg.get("vanilla_vae", False))
    vae_cfg.setdefault("topology", "flat" if is_vanilla else "spatial")
    recon_loss = vae_cfg.pop("recon_loss", "mse")
    mse_use_sigmoid = bool(vae_cfg.pop("mse_use_sigmoid", True))
    vae_cfg["enc_channels"] = tuple(vae_cfg.get("enc_channels", (32, 64, 128)))
    vae_cfg["dec_channels"] = tuple(vae_cfg.get("dec_channels", (128, 64, 32)))
    vae_ckpt = Path(cfg["vae_ckpt_path"])
    vae, vae_vars = load_vae_from_checkpoint(
        vae_ckpt.parent, vae_ckpt.name, config=vae_cfg,
        recon_loss=recon_loss, mse_use_sigmoid=mse_use_sigmoid)

    codebook = load_codebook(cfg["codebook_path"])
    codebook_vectors = jnp.asarray(codebook["z_medoid"])  # (K, latent_dim)

    class_labels = cfg.get("class_labels", [None])
    samples_per_class = int(cfg.get("samples_per_class", 8))
    temperature = float(cfg.get("temperature", 1.0))
    top_k = cfg.get("top_k")
    top_k = int(top_k) if top_k is not None else None
    num_tokens = int(tf_cfg["num_tokens"])
    max_seq_len = int(tf_cfg["max_seq_len"])
    # the codebook is ground truth for the per-cell latent width — a stale
    # yaml (e.g. regenerated after the training run) must not break decode
    latent_dim = int(codebook_vectors.shape[-1])

    # all classes sample in ONE batched KV-cached call (the reference loops
    # classes with a full-prefix recompute per token, generate_samples.py:66)
    conditional = all(c is not None for c in class_labels)
    n_total = samples_per_class * len(class_labels)
    y = None
    if conditional and transformer.num_classes > 0:
        y = jnp.asarray(np.repeat([int(c) for c in class_labels],
                                  samples_per_class), jnp.int32)
    print(f"[generate] {n_total} samples "
          f"({len(class_labels)} classes x {samples_per_class}), one batch")

    if is_vanilla:
        bos = num_tokens - 1
        first = jnp.full((n_total, 1), bos, jnp.int32)
        codes = sample_autoregressive(
            transformer, tf_params, first, steps=max_seq_len - 1,
            rng=rng, temperature=temperature, top_k=top_k, labels=y)
        codes = codes[:, 1:]  # drop BOS
        zq = codebook_vectors[codes[:, 0]]  # (B, latent_dim)
    else:
        first = jax.random.randint(jax.random.fold_in(rng, 1),
                                   (n_total, 1), 0, num_tokens)
        codes = sample_autoregressive(
            transformer, tf_params, first, steps=max_seq_len - 1,
            rng=rng, temperature=temperature, top_k=top_k, labels=y)
        zq = codebook_vectors[codes]  # (B, 16, latent_dim)
        zq = zq.reshape(n_total, 4, 4, latent_dim)  # NHWC grid

    # one-off artifact decode: run on local CPU, not a remote compile.
    # Display mapping honors the training-time output space: sigmoid only
    # when the loss saw sigmoid (bce or mse_use_sigmoid), CIFAR raw-logit
    # models denormalize instead. The reference's generate_samples.py:97
    # hard-codes .sigmoid() — a bug its own evaluators avoid (reference
    # evaluate_quantization_loss.py:53-62); with mse_use_sigmoid=false the
    # sigmoid of normalized-space logits saturates to an all-black grid.
    from ..parallel import run_on_cpu
    from ..utils.images import unnormalize_images

    apply_sigmoid = (recon_loss == "bce") or mse_use_sigmoid
    dataset_name = str(cfg.get("dataset_name", "fashionmnist"))
    logits = np.asarray(run_on_cpu(
        lambda v, z: vae.apply(v, z, method=vae.decode), vae_vars, zq))
    final = unnormalize_images(logits, dataset_name, apply_sigmoid)
    out_dir = Path(cfg["output_dir"])
    out_path = out_dir / str(cfg.get("output_filename", "generated_samples.png"))
    save_image_grid(final, out_path, nrow=samples_per_class, padding=2)
    print(f"[generate] Saved generated images to {out_path}")
    return out_path
