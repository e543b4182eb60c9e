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


def enable_compilation_cache() -> None:
    """Persist compiled XLA programs across runs (first compiles over the
    TPU tunnel cost 20-160s each; the cache amortizes them)."""
    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               str(Path.home() / ".cache" / "vqvae_tpu_xla"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # older jax without the knobs


force_platform_from_env()
enable_compilation_cache()
