"""Exact k-nearest-neighbor search as tiled MXU matmuls + streaming top-k.

Replaces the reference's sklearn (<50k points) / FAISS (>=50k) backend split
(reference src/geo/knn_graph_optimized.py:25-168) with a single tiled
brute-force kernel: squared distances ``|q|^2 - 2 q.x + |x|^2`` computed on
the MXU in f32, streamed over database tiles with a running top-k merge, so
memory stays O(query_tile * db_tile) regardless of N. The reference's 50k
``size_threshold`` backend switch becomes a tile-size knob.

Queries are processed in host-level blocks (default 128k rows): every block
reuses ONE compiled program (block shapes are constant), which bounds both
device memory and program size at million-row scale.

Supports euclidean and cosine metrics with sklearn/FAISS-compatible
semantics (cosine distance = 1 - cosine similarity on normalized vectors,
reference knn_graph_optimized.py:86-97).
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_INF = jnp.float32(jnp.inf)


@functools.partial(jax.jit, static_argnames=("k", "metric", "query_tile",
                                             "db_tile", "approx", "margin",
                                             "recall"))
def _knn_block(
    zq: jax.Array,        # (Qp, D) padded query block, f32 (pre-normalized
                          #  for cosine)
    z: jax.Array,         # (Np, D) padded database, f32 (pre-normalized)
    n_valid: jax.Array,   # scalar int32: true db rows
    q_valid: jax.Array,   # scalar int32: true query rows in this block
    k: int,
    metric: str,
    query_tile: int,
    db_tile: int,
    approx: bool,
    margin: int,
    recall: float,
) -> Tuple[jax.Array, jax.Array]:
    Qp, D = zq.shape
    Np = z.shape[0]
    n_qt = Qp // query_tile
    n_dt = Np // db_tile
    # The streaming distance matmul runs at default MXU precision (bf16
    # passes on TPU) and the |q|^2 - 2 q.x + |x|^2 form cancels for
    # near-duplicates, so we over-select k+margin candidates with the fast
    # form and re-rank them with exact f32 per-candidate distances. The
    # result is exact whenever fewer than ``margin`` bf16-misranked
    # near-ties collide per query; raise ``margin`` for data with larger
    # near-duplicate clusters (adversarial test: tests/test_knn_graph.py).
    k_sel = min(k + margin, Np)

    db_sq = (z * z).sum(axis=1)  # (Np,)
    row_valid = jnp.arange(Np, dtype=jnp.int32) < n_valid
    q_row_valid = jnp.arange(Qp, dtype=jnp.int32) < q_valid

    zq_t = zq.reshape(n_qt, query_tile, D)
    qv_t = q_row_valid.reshape(n_qt, query_tile)
    q_sq_t = (zq * zq).sum(axis=1).reshape(n_qt, query_tile)

    def query_step(_, inputs):
        q, qv, qs = inputs  # (T,D), (T,), (T,)

        def db_step(carry, j):
            best_d, best_i = carry  # (T,k_sel), (T,k_sel)
            start = j * db_tile
            x = jax.lax.dynamic_slice_in_dim(z, start, db_tile, axis=0)
            xs = jax.lax.dynamic_slice_in_dim(db_sq, start, db_tile, axis=0)
            xv = jax.lax.dynamic_slice_in_dim(row_valid, start, db_tile,
                                              axis=0)
            dots = jnp.dot(q, x.T, preferred_element_type=jnp.float32)
            if metric == "cosine":
                d = 1.0 - dots  # distance = 1 - similarity
            else:
                d = qs[:, None] - 2.0 * dots + xs[None, :]
            d = jnp.where(xv[None, :], d, _INF)  # mask padded db rows
            if approx:
                # TPU PartialReduce: ~10x cheaper than the full sort-based
                # top_k that otherwise dominates kNN wall-clock; the exact
                # re-rank below keeps reported distances exact, and a
                # recall test bounds the candidate-miss rate
                cand_d, cand_j = jax.lax.approx_min_k(
                    d, k_sel, recall_target=recall)
            else:
                neg_d, cand_j = jax.lax.top_k(-d, k_sel)  # per-tile top-k
                cand_d = -neg_d
            cand_i = (cand_j + start).astype(jnp.int32)
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

    _, (dists, idxs) = jax.lax.scan(query_step, None, (zq_t, qv_t, q_sq_t))
    return dists.reshape(Qp, k), idxs.reshape(Qp, k)


def knn_search(
    z: np.ndarray | jax.Array,
    k: int,
    metric: str = "euclidean",
    query_tile: int = 1024,
    db_tile: int = 8192,
    query_block: int = 131_072,
    approx: bool = False,
    margin: int | None = None,
    recall_target: float | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """All-pairs exact kNN: returns (distances, indices), each (N, k).

    Self-matches are *included* (distance 0 at the query row, like the raw
    sklearn/FAISS queries before self-stripping); graph assembly strips
    them. ``k`` is capped at N.

    ``VQVAE_TPU_KNN_DEVICE_MAX`` (rows, default 4M) routes larger inputs to
    the native threaded host kernel as an escape hatch.

    ``margin`` (default 4, env ``VQVAE_TPU_KNN_MARGIN``): extra candidates
    kept per query before the exact f32 re-rank. Results are exact unless
    more than ``margin`` bf16 near-ties collide per query, in which case
    any swapped neighbor differs by at most the tie spread; raise the
    margin to cover known near-duplicate cluster sizes.

    ``approx=True`` additionally relaxes per-tile candidate selection to
    ``lax.approx_min_k`` (per-tile candidate recall; reported distances
    stay exact for returned indices). ``recall_target`` (default 0.95,
    env ``VQVAE_TPU_KNN_RECALL``) trades selection speed for candidate
    recall — measured sweep in docs/benchmarks.md.
    """
    if margin is None:
        margin = int(os.environ.get("VQVAE_TPU_KNN_MARGIN", 4))
    if recall_target is None:
        recall_target = float(os.environ.get("VQVAE_TPU_KNN_RECALL", 0.95))
    z = np.asarray(z, dtype=np.float32)
    if z.ndim != 2:
        raise ValueError("z must be (N, D)")
    n = z.shape[0]
    if n == 0 or k <= 0:
        return (np.empty((n, 0), np.float32), np.empty((n, 0), np.int64))
    k = min(k, n)

    device_max = int(os.environ.get("VQVAE_TPU_KNN_DEVICE_MAX", 4_000_000))
    if n > device_max and metric == "euclidean":
        try:
            from .. import native

            if native.available():
                return native.knn_exact(z, k)
        except ImportError:
            pass

    query_tile = max(8, min(query_tile, _round_up(n, 8)))
    db_tile = max(128, min(db_tile, _round_up(n, 128)))
    if metric == "cosine":
        zn = z / (np.linalg.norm(z, axis=1, keepdims=True) + 1e-8)
    else:
        zn = z

    n_db_pad = _round_up(n, db_tile)
    z_db = zn if n_db_pad == n else np.concatenate(
        [zn, np.zeros((n_db_pad - n, z.shape[1]), np.float32)])
    z_db_j = jnp.asarray(z_db)

    block = min(_round_up(n, query_tile), _round_up(query_block, query_tile))
    dists = np.empty((n, k), np.float32)
    idxs = np.empty((n, k), np.int64)
    for s in range(0, n, block):
        e = min(s + block, n)
        q = np.zeros((block, z.shape[1]), np.float32)
        q[:e - s] = zn[s:e]
        d, i = _knn_block(jnp.asarray(q), z_db_j, jnp.int32(n),
                          jnp.int32(e - s), k, metric, query_tile, db_tile,
                          approx, margin, float(recall_target))
        dists[s:e] = np.asarray(d[:e - s])
        idxs[s:e] = np.asarray(i[:e - s]).astype(np.int64)
    return dists, idxs


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
