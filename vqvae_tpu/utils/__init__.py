from .checkpoint import Checkpointer, auto_detect_vae_config, load_vae_from_checkpoint
from .logging import MetricsLogger
from .images import save_image_grid
from .latents import save_latents

__all__ = [
    "Checkpointer",
    "auto_detect_vae_config",
    "load_vae_from_checkpoint",
    "MetricsLogger",
    "save_image_grid",
    "save_latents",
]
