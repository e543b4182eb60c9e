"""Stage entry points (importable, in-process composable).

The reference pipeline spawns each stage as a subprocess communicating
through files (reference scripts/run_fashionmnist_spatial_geodesic_pipeline
.py:23, :60-95); here each stage is a plain function over a Config, so the
orchestrator runs them in one process (keeping XLA compilation caches warm)
while the file-artifact contract — experiments/<dataset>/<variant>/
<distance>/{vae,codebook,transformer,evaluation} — is preserved.
"""
from .train_vae import train_vae_main
from .build_codebook import build_codebook_main
from .build_codebook_legacy import build_codebook_legacy_main
from .train_transformer import train_transformer_main
from .generate_samples import generate_samples_main
from .evaluate_model import evaluate_model_main

__all__ = [
    "train_vae_main",
    "build_codebook_main",
    "build_codebook_legacy_main",
    "train_transformer_main",
    "generate_samples_main",
    "evaluate_model_main",
]
