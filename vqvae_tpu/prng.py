"""Seeded PRNG-key plumbing.

The reference seeds python/numpy/torch globally (reference
src/utils/system.py:6-13); in JAX randomness is explicit, so we thread a
root key through every stage and split named subkeys deterministically.
"""
from __future__ import annotations

from typing import Dict, Iterable

import jax
import numpy as np


def root_key(seed: int) -> jax.Array:
    return jax.random.key(int(seed))


def named_keys(key: jax.Array, names: Iterable[str]) -> Dict[str, jax.Array]:
    """Deterministically derive one subkey per name (order-independent).

    Uses ``jax.random.fold_in`` with a stable hash of the name so adding a
    new consumer never perturbs existing streams.
    """
    out = {}
    for name in names:
        h = np.uint32(np.frombuffer(name.encode(), dtype=np.uint8).sum() * 2654435761 % (2**31))
        out[name] = jax.random.fold_in(key, int(h))
    return out


def epoch_key(key: jax.Array, epoch: int) -> jax.Array:
    return jax.random.fold_in(key, int(epoch))


def set_host_seed(seed: int) -> np.random.Generator:
    """Seed host-side numpy (data shuffling) and return a Generator."""
    return np.random.default_rng(int(seed))
