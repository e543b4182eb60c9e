"""Device mesh and sharding helpers.

The reference is strictly single-device (reference src/utils/system.py:15-20,
no torch.distributed anywhere); here every stage is written against a
`jax.sharding.Mesh` so the same code runs on 1 chip or a pod slice:

- ``data`` axis: batch sharding for VAE / Transformer / VQ-VAE training and
  latent extraction (pure data parallelism — XLA inserts psum for grads).
- the same axis doubles as the **source/node axis** for the geometry kernels:
  multi-source shortest-path relaxation shards the K-source distance matrix
  rows across chips, and kNN query tiles shard the same way. This is this
  framework's analog of sequence parallelism (SURVEY.md §2.3).

Collectives ride ICI via standard XLA lowering of `psum`/`all_gather` on the
mesh; nothing here talks NCCL/MPI.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


@functools.lru_cache(maxsize=8)
def get_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard leading (batch) axis across the data axis; replicate the rest."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def source_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the source axis of a (K, N) distance matrix across chips."""
    return NamedSharding(mesh, P(DATA_AXIS, None))


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with leading-axis sharding."""
    def _put(x):
        return jax.device_put(x, data_sharding(mesh, np.ndim(x)))
    return jax.tree_util.tree_map(_put, batch)


def local_device_count() -> int:
    return jax.local_device_count()


def is_primary() -> bool:
    """True on the process that should write artifacts/logs (process 0).

    Single-process (incl. single-host multi-chip) is always primary; in
    multi-host runs initialized via jax.distributed only process 0 is.
    """
    return jax.process_index() == 0


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def run_on_cpu(fn, *args):
    """Run a one-shot jitted computation on the LOCAL CPU backend.

    On this platform TPU programs compile through a remote service
    (minutes per program, uncacheable); a jitted ``model.init`` therefore
    cost 100-300 s of each training stage. Parameter init is tiny compute
    with no reason to touch the accelerator — compile it locally on CPU
    and ``device_put`` the result wherever it's needed (the engines already
    re-place state with ``replicated_sharding``). Falls back to the default
    backend when no CPU devices exist (e.g. already running on CPU)."""
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return jax.jit(fn)(*args)
    if jax.default_backend() == "cpu":
        return jax.jit(fn)(*args)

    def _to_host(x):
        # device_get leaves typed PRNG key arrays committed to their device
        # (which would silently pull the jit back onto the accelerator —
        # a minutes-long remote compile); place every jax array explicitly
        # on the CPU device instead.
        if isinstance(x, jax.Array):
            return jax.device_put(x, cpu)
        return x

    args = jax.tree_util.tree_map(_to_host, jax.device_get(args))
    with jax.default_device(cpu):
        return jax.device_get(jax.jit(fn)(*args))
