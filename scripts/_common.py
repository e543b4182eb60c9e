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


def maybe_init_distributed() -> bool:
    """Multi-host (multi-process) init: ``jax.distributed.initialize``.

    Opt-in per run — triggered when ``VQVAE_TPU_DISTRIBUTED=1`` or a
    coordinator address is set. On TPU pod slices ``initialize()``
    autodetects everything from the TPU environment; elsewhere (e.g. CPU
    multi-process tests) pass the standard envs:

        JAX_COORDINATOR_ADDRESS=host:port
        JAX_NUM_PROCESSES=<P>  JAX_PROCESS_ID=<i>

    Single-host multi-chip (a v4-8 / v5e-8 board) needs NO init — the mesh
    already spans all local chips. A real v4-8 run is therefore just:

        python scripts/run_pipeline.py --preset configs/fashionmnist/spatial/geodesic

    (the engines shard batches over ``get_mesh()``, which is built from
    ``jax.devices()`` — global across processes once initialized).
    Returns True when distributed mode was initialized.
    """
    if (os.environ.get("VQVAE_TPU_DISTRIBUTED") not in ("1", "true")
            and not os.environ.get("JAX_COORDINATOR_ADDRESS")):
        return False
    import jax

    kwargs = {}
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = os.environ["JAX_COORDINATOR_ADDRESS"]
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:  # idempotent: the CLI prologue may run first
        if "only be called once" not in str(e):
            raise
    return True


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
maybe_init_distributed()
enable_compilation_cache()
