"""Euclidean K-means as jitted Lloyd iterations on the MXU.

Replaces sklearn.cluster.KMeans (reference demos/codebook_comparison.py:14,
:73-77 uses it for the Euclidean-codebook baseline): assignment is a
blockwise ||a||^2 - 2ab + ||b||^2 argmin matmul, the update is a
segment-sum, and the loop is a lax.while_loop with an inertia-based stop.
k-means++ initialization with the same d^2-sampling as the graph variant.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("n_clusters", "max_iter"))
def _lloyd(z: jax.Array, init_centers: jax.Array, n_clusters: int,
           max_iter: int, tol: float) -> Tuple[jax.Array, jax.Array, jax.Array]:
    n, d = z.shape
    z = z.astype(jnp.float32)
    z_sq = (z * z).sum(1)

    def assign(centers):
        c_sq = (centers * centers).sum(1)
        d2 = z_sq[:, None] - 2.0 * (z @ centers.T) + c_sq[None, :]
        labels = jnp.argmin(d2, axis=1)
        inertia = jnp.take_along_axis(d2, labels[:, None], axis=1).sum()
        return labels, jnp.maximum(inertia, 0.0)

    def body(state):
        centers, _, prev_inertia, it = state
        labels, inertia = assign(centers)
        sums = jax.ops.segment_sum(z, labels, num_segments=n_clusters)
        counts = jax.ops.segment_sum(jnp.ones((n,), jnp.float32), labels,
                                     num_segments=n_clusters)
        new_centers = jnp.where(counts[:, None] > 0,
                                sums / jnp.maximum(counts[:, None], 1.0),
                                centers)
        return new_centers, labels, inertia, it + 1

    def cond(state):
        _, _, inertia, it = state
        return it < max_iter

    init_labels, init_inertia = assign(init_centers)
    centers, labels, inertia, _ = jax.lax.while_loop(
        cond, body, (init_centers, init_labels, init_inertia, 0))
    labels, inertia = assign(centers)
    return centers, labels, inertia


def kmeans_plus_plus_init(z: np.ndarray, n_clusters: int, seed: int = 42
                          ) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n = z.shape[0]
    centers = [int(rng.integers(0, n))]
    d_min = np.full(n, np.inf, np.float64)
    for _ in range(1, n_clusters):
        diff = z - z[centers[-1]]
        d_min = np.minimum(d_min, (diff * diff).sum(1))
        probs = d_min.copy()
        probs[centers] = 0.0
        s = probs.sum()
        if s <= 0:
            pool = np.setdiff1d(np.arange(n), centers)
            centers.append(int(rng.choice(pool)))
        else:
            centers.append(int(rng.choice(n, p=probs / s)))
    return z[np.asarray(centers)].astype(np.float32)


def fit_kmeans(z: np.ndarray, n_clusters: int, seed: int = 42,
               max_iter: int = 100, tol: float = 1e-4
               ) -> Tuple[np.ndarray, np.ndarray, float]:
    """(centers (K,D), labels (N,), inertia). sklearn-compatible contract."""
    z = np.asarray(z, np.float32)
    init = kmeans_plus_plus_init(z, n_clusters, seed)
    centers, labels, inertia = _lloyd(jnp.asarray(z), jnp.asarray(init),
                                      n_clusters, max_iter, tol)
    return (np.asarray(centers), np.asarray(labels).astype(np.int64),
            float(inertia))
