"""Exact k-nearest-neighbor search as tiled MXU matmuls + streaming top-k.

Replaces the reference's sklearn (<50k points) / FAISS (>=50k) backend split
(reference src/geo/knn_graph_optimized.py:25-168) with a single tiled
brute-force kernel: squared distances ``|q|^2 - 2 q.x + |x|^2`` computed on
the MXU in f32, streamed over database tiles with a running top-k merge, so
memory stays O(query_tile * db_tile) regardless of N. The reference's 50k
``size_threshold`` backend switch becomes a tile-size knob.

Supports euclidean and cosine metrics with sklearn/FAISS-compatible
semantics (cosine distance = 1 - cosine similarity on normalized vectors,
reference knn_graph_optimized.py:86-97).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_INF = jnp.float32(jnp.inf)


@functools.partial(jax.jit, static_argnames=("k", "metric", "query_tile", "db_tile"))
def _knn_device(
    z: jax.Array,        # (Np, D) padded database/query matrix, f32
    n_valid: jax.Array,  # scalar int32, true number of rows
    k: int,
    metric: str,
    query_tile: int,
    db_tile: int,
) -> Tuple[jax.Array, jax.Array]:
    Np, D = z.shape
    n_qt = Np // query_tile
    n_dt = Np // db_tile
    # The streaming distance matmul runs at default MXU precision (bf16
    # passes on TPU) and the |q|^2 - 2 q.x + |x|^2 form cancels for
    # near-duplicates, so we over-select candidates with the fast form and
    # re-rank them with exact f32 per-candidate distances.
    k_sel = min(k + 4, Np)

    if metric == "cosine":
        norms = jnp.linalg.norm(z, axis=1, keepdims=True)
        z = z / (norms + 1e-8)
    sq = (z * z).sum(axis=1)  # (Np,)

    row_valid = jnp.arange(Np, dtype=jnp.int32) < n_valid

    z_q = z.reshape(n_qt, query_tile, D)
    valid_q = row_valid.reshape(n_qt, query_tile)
    sq_q = sq.reshape(n_qt, query_tile)

    def query_step(_, inputs):
        q, qv, qs = inputs  # (T,D), (T,), (T,)

        def db_step(carry, j):
            best_d, best_i = carry  # (T,k_sel), (T,k_sel)
            start = j * db_tile
            x = jax.lax.dynamic_slice_in_dim(z, start, db_tile, axis=0)
            xs = jax.lax.dynamic_slice_in_dim(sq, start, db_tile, axis=0)
            xv = jax.lax.dynamic_slice_in_dim(row_valid, start, db_tile, axis=0)
            dots = jnp.dot(q, x.T, preferred_element_type=jnp.float32)
            if metric == "cosine":
                d = 1.0 - dots  # distance = 1 - similarity
            else:
                d = qs[:, None] - 2.0 * dots + xs[None, :]
            d = jnp.where(xv[None, :], d, _INF)  # mask padded db rows
            cand_d, cand_j = jax.lax.top_k(-d, k_sel)  # per-tile top-k
            cand_d = -cand_d
            cand_i = (cand_j + start).astype(jnp.int32)
            # merge running best with tile candidates
            all_d = jnp.concatenate([best_d, cand_d], axis=1)
            all_i = jnp.concatenate([best_i, cand_i], axis=1)
            merged_d, sel = jax.lax.top_k(-all_d, k_sel)
            merged_i = jnp.take_along_axis(all_i, sel, axis=1)
            return (-merged_d, merged_i), None

        init = (jnp.full((query_tile, k_sel), _INF),
                jnp.full((query_tile, k_sel), -1, jnp.int32))
        (best_d, best_i), _ = jax.lax.scan(db_step, init,
                                           jnp.arange(n_dt, dtype=jnp.int32))
        # exact re-rank of the candidate set in f32 on the VPU
        cand = z[jnp.maximum(best_i, 0)]               # (T, k_sel, D)
        if metric == "euclidean":
            diff = q[:, None, :] - cand
            exact = jnp.sqrt(jnp.maximum((diff * diff).sum(-1), 0.0))
        else:
            exact = 1.0 - (q[:, None, :] * cand).sum(-1)
        exact = jnp.where(best_i >= 0, exact, _INF)
        neg_top, sel = jax.lax.top_k(-exact, k)
        best_d = -neg_top
        best_i = jnp.take_along_axis(best_i, sel, axis=1)
        best_d = jnp.where(qv[:, None], best_d, _INF)
        return None, (best_d, best_i)

    _, (dists, idxs) = jax.lax.scan(query_step, None, (z_q, valid_q, sq_q))
    return dists.reshape(Np, k), idxs.reshape(Np, k)


def knn_search(
    z: np.ndarray | jax.Array,
    k: int,
    metric: str = "euclidean",
    query_tile: int = 1024,
    db_tile: int = 8192,
) -> Tuple[np.ndarray, np.ndarray]:
    """All-pairs exact kNN: returns (distances, indices), each (N, k).

    Self-matches are *included* (distance 0 at the query row, like the raw
    sklearn/FAISS queries before self-stripping); graph assembly strips them.
    ``k`` is capped at N. Padding rows are handled internally; tiles are
    chosen to align with MXU/VPU lane widths.
    """
    z = np.asarray(z, dtype=np.float32)
    if z.ndim != 2:
        raise ValueError("z must be (N, D)")
    n = z.shape[0]
    if n == 0 or k <= 0:
        return (np.empty((n, 0), np.float32), np.empty((n, 0), np.int64))
    k = min(k, n)

    query_tile = max(8, min(query_tile, _round_up(n, 8)))
    db_tile = max(128, min(db_tile, _round_up(n, 128)))
    n_pad = _round_up(n, int(np.lcm(query_tile, db_tile)))
    if n_pad > n:
        z_p = np.zeros((n_pad, z.shape[1]), np.float32)
        z_p[:n] = z
    else:
        z_p = z
    d, i = _knn_device(jnp.asarray(z_p), jnp.int32(n), k, metric,
                       query_tile, db_tile)
    d = np.asarray(d[:n])
    i = np.asarray(i[:n]).astype(np.int64)
    return d, i


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
