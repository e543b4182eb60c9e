"""Shared CLI prologue: repo-root imports + platform selection."""
import os
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def force_platform_from_env() -> None:
    """Honor VQVAE_TPU_PLATFORM=cpu|tpu if set (the site bootstrap on some
    machines latches the accelerator platform; jax.config wins over env)."""
    plat = os.environ.get("VQVAE_TPU_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


force_platform_from_env()
