"""Exact k-nearest-neighbor search as tiled MXU matmuls + streaming top-k.

Replaces the reference's sklearn (<50k points) / FAISS (>=50k) backend split
(reference src/geo/knn_graph_optimized.py:25-168) with a single tiled
brute-force kernel: squared distances ``|q|^2 - 2 q.x + |x|^2`` computed on
the MXU in f32, streamed over database tiles, so memory stays
O(query_tile * db_tile) regardless of N. The reference's 50k
``size_threshold`` backend switch becomes a tile-size knob.

Selection is two-level and *deferred*: each database tile contributes its
local ``k + margin`` candidates (cheap per-tile top-k / PartialReduce), the
per-tile winners are stacked across the whole database stream, and ONE
exact f32 re-rank + final top-k per query tile picks the global neighbors.
Compared to the previous running-merge formulation (a sort-based top-k over
the merged candidate buffer after *every* database tile) this removes the
scan's serial merge dependency entirely — the per-tile work is just
matmul + local select — which is what moves the kernel from
selection-bound toward bandwidth-bound.

Multi-chip: pass ``mesh`` to shard the query axis across devices with
``shard_map`` (database replicated — it is small: N x 16 f32 = 63 MB at the
983k north-star shape). Each chip streams the full database over its own
query rows; no collectives are needed (SURVEY.md §2.2: the FAISS-replacement
row is committed to chip-sharded kNN).

Supports euclidean and cosine metrics with sklearn/FAISS-compatible
semantics (cosine distance = 1 - cosine similarity on normalized vectors,
reference knn_graph_optimized.py:86-97).
"""
from __future__ import annotations

import functools
import os
import warnings
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_INF = jnp.float32(jnp.inf)


def _exact_rerank(q, qv, all_d, all_i, z, k: int, metric: str):
    """Exact f32 re-rank of stacked candidates for one query tile.

    ``all_d`` carries the (approximate) selection values: non-finite entries
    mark unfilled / padded candidate slots and are excluded. Returned
    distances are exact for the returned indices.
    """
    cand = z[all_i]                                # (T, C, D)
    if metric == "euclidean":
        diff = q[:, None, :] - cand
        exact = jnp.sqrt(jnp.maximum((diff * diff).sum(-1), 0.0))
    else:
        exact = 1.0 - (q[:, None, :] * cand).sum(-1)
    # padded db rows / unfilled selection slots carry +inf selection
    # values — mask them without another gather
    exact = jnp.where(jnp.isfinite(all_d.astype(jnp.float32)), exact, _INF)
    neg_top, sel = jax.lax.top_k(-exact, k)
    best_d = jnp.where(qv[:, None], -neg_top, _INF)
    best_i = jnp.take_along_axis(all_i, sel, axis=1)
    return best_d, best_i


def _knn_block_impl(
    zq: jax.Array,           # (Qp, D) padded query block (local shard)
    z: jax.Array,            # (Np, D) padded database, replicated
    row_valid: jax.Array,    # (Np,) bool: true db rows
    q_row_valid: jax.Array,  # (Qp,) bool: true query rows (local shard)
    *,
    k: int,
    metric: str,
    query_tile: int,
    db_tile: int,
    approx: bool,
    margin: int,
    recall: float,
    aggregate: bool = True,
    sel_bf16: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    Qp, D = zq.shape
    Np = z.shape[0]
    n_qt = Qp // query_tile
    n_dt = Np // db_tile
    # The streaming distance matmul runs at default MXU precision (bf16
    # passes on TPU) and the |q|^2 - 2 q.x + |x|^2 form cancels for
    # near-duplicates, so each tile over-selects k+margin candidates with
    # the fast form; the deferred exact f32 re-rank below restores exact
    # distances and ordering. The result is exact unless more than
    # ``margin`` bf16-misranked near-ties collide per query *within one
    # database tile* (adversarial test: tests/test_knn_graph.py).
    k_sel = min(k + margin, db_tile)

    db_sq = (z * z).sum(axis=1)  # (Np,)

    zq_t = zq.reshape(n_qt, query_tile, D)
    qv_t = q_row_valid.reshape(n_qt, query_tile)
    q_sq_t = (zq * zq).sum(axis=1).reshape(n_qt, query_tile)

    def query_step(_, inputs):
        q, qv, qs = inputs  # (T,D), (T,), (T,)

        def db_step(_, j):
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
            if sel_bf16:
                # selection in bf16 halves the selection phase's bandwidth;
                # the exact f32 re-rank below restores exact distances and
                # ordering (misranked bf16 near-ties are covered by margin,
                # recall re-validated by tools/bench_knn.py --recalls)
                d = d.astype(jnp.bfloat16)
            if approx:
                # TPU PartialReduce: ~10x cheaper than the full sort-based
                # top_k; the exact re-rank below keeps reported distances
                # exact, and a recall contract test bounds the
                # candidate-miss rate (tests/test_knn_graph.py).
                # aggregate=False skips even the per-tile exact top-k over
                # the PartialReduce output — the final re-rank is the only
                # aggregation anywhere (wider candidate set, same recall).
                cand_d, cand_j = jax.lax.approx_min_k(
                    d, k_sel, recall_target=recall,
                    aggregate_to_topk=aggregate)
            else:
                neg_d, cand_j = jax.lax.top_k(-d, k_sel)  # per-tile top-k
                cand_d = -neg_d
            return None, (cand_d, (cand_j + start).astype(jnp.int32))

        # stream all db tiles, stacking per-tile candidates — no serial
        # merge in the scan carry
        _, (cand_d, cand_i) = jax.lax.scan(db_step, None,
                                           jnp.arange(n_dt, dtype=jnp.int32))
        width = cand_i.shape[2]  # k_sel, or PartialReduce width (agg=False)
        all_d = cand_d.transpose(1, 0, 2).reshape(query_tile, n_dt * width)
        all_i = cand_i.transpose(1, 0, 2).reshape(query_tile, n_dt * width)
        # ONE exact f32 re-rank over every candidate from every tile
        return None, _exact_rerank(q, qv, all_d, all_i, z, k, metric)

    _, (dists, idxs) = jax.lax.scan(query_step, None, (zq_t, qv_t, q_sq_t))
    return dists.reshape(Qp, k), idxs.reshape(Qp, k)


# last effective kNN kernel configuration, recorded by knn_search for
# provenance consumers (bench.py detail fields); see effective_pallas_params
KNN_EFFECTIVE: dict = {}


def effective_pallas_params(qp: int, sel_tile: int, db_tile: int,
                            bins: int, packed: bool):
    """The (sel_tile, bins, packed) the fused kernel will ACTUALLY use for a
    padded query block of ``qp`` rows — the impl adjusts requested values to
    satisfy tiling/divisibility, so provenance (e.g. bench.py's knn_packed
    field) must go through this, not the requesting env var."""
    if qp % sel_tile:
        sel_tile = 128 if qp % 128 == 0 else qp
    bins = min(bins, db_tile)
    while bins > 8 and db_tile % bins:  # bins must divide the db tile
        bins //= 2
    if packed and (bins & (bins - 1)):
        warnings.warn(
            f"packed kNN selection disabled: effective bins={bins} is not a "
            f"power of two (db_tile={db_tile}); running the unpacked kernel")
        packed = False  # packed slot decode needs power-of-two bins
    return sel_tile, bins, packed


def _knn_block_impl_fused(
    zq: jax.Array,           # (Qp, D) padded query block (local shard)
    z: jax.Array,            # (Np, D) padded database, replicated
    row_valid: jax.Array,    # (Np,) bool: true db rows
    q_row_valid: jax.Array,  # (Qp,) bool: true query rows (local shard)
    *,
    k: int,
    metric: str,
    query_tile: int,
    db_tile: int,
    bins: int,
    margin: int,
    interpret: bool,
    # query rows per Pallas block: the db stream is re-read once per block,
    # so larger tiles cut HBM traffic 1/sel_tile; VMEM scratch grows with
    # sel_tile*bins (4 buffers unpacked / 2 packed) — 128 -> 2 MB,
    # 512 -> 8 MB at bins=1024 unpacked
    sel_tile: int = 128,
    packed: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused Pallas selection (ops/pallas_knn.py) + scanned exact re-rank."""
    from .pallas_knn import CAND_LANES, fused_select

    Qp = zq.shape[0]
    sel_tile, bins, packed = effective_pallas_params(
        Qp, sel_tile, db_tile, bins, packed)
    n_valid = jnp.sum(row_valid.astype(jnp.int32))
    k_sel = min(k + margin, CAND_LANES)
    cand_d, cand_i = fused_select(
        zq, z, n_valid, metric=metric, sel_tile=sel_tile, db_tile=db_tile,
        bins=bins, k_sel=k_sel, interpret=interpret, packed=packed)
    # the kernel emits CAND_LANES(=128)-wide blocks for lane alignment but
    # only the first k_sel lanes are ever filled (the rest are +inf/-1);
    # slicing here cuts the exact re-rank's gather + distance work ~8x
    cand_d = cand_d[:, :k_sel]
    cand_i = cand_i[:, :k_sel]
    n_qt = Qp // query_tile
    zq_t = zq.reshape(n_qt, query_tile, -1)
    qv_t = q_row_valid.reshape(n_qt, query_tile)
    cd_t = cand_d.reshape(n_qt, query_tile, -1)
    ci_t = cand_i.reshape(n_qt, query_tile, -1)

    def step(_, inputs):
        q, qv, ad, ai = inputs
        return None, _exact_rerank(q, qv, ad, ai, z, k, metric)

    _, (dists, idxs) = jax.lax.scan(step, None, (zq_t, qv_t, cd_t, ci_t))
    return dists.reshape(Qp, k), idxs.reshape(Qp, k)


@functools.lru_cache(maxsize=32)
def _build_knn_fn(mesh, k: int, metric: str, query_tile: int, db_tile: int,
                  approx: bool, margin: int, recall: float,
                  aggregate: bool = True, sel_bf16: bool = False,
                  kernel: str = "xla", bins: int = 1024,
                  interpret: bool = False, sel_tile: int = 128,
                  packed: bool = False):
    """Compiled block kernel; query-axis shard_map when a >1-device mesh is
    given, plain single-device jit otherwise."""
    if kernel == "pallas":
        impl = functools.partial(_knn_block_impl_fused, k=k, metric=metric,
                                 query_tile=query_tile, db_tile=db_tile,
                                 bins=bins, margin=margin,
                                 interpret=interpret, sel_tile=sel_tile,
                                 packed=packed)
    else:
        impl = functools.partial(_knn_block_impl, k=k, metric=metric,
                                 query_tile=query_tile, db_tile=db_tile,
                                 approx=approx, margin=margin, recall=recall,
                                 aggregate=aggregate, sel_bf16=sel_bf16)
    if mesh is not None and len(mesh.devices.ravel()) > 1:
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        impl = jax.shard_map(
            impl, mesh=mesh,
            in_specs=(P(DATA_AXIS, None), P(None, None), P(None),
                      P(DATA_AXIS)),
            out_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None)),
            # pallas_call out_shapes carry no varying-mesh-axes metadata;
            # the kernel is per-shard pure (no collectives), so the check
            # adds nothing here
            check_vma=(kernel != "pallas"))
    return jax.jit(impl)


def resolve_knn_kernel(approx: bool, kernel: str | None = None) -> str:
    """Resolve which selection kernel ``knn_search`` will run.

    Precedence: explicit ``kernel`` arg > ``VQVAE_TPU_KNN_KERNEL`` env >
    platform default (``"pallas"`` for approx requests on a real TPU,
    ``"xla"`` otherwise). Exposed so callers that report measurements
    (bench.py) can label the kernel that actually executed.
    """
    if kernel is None:
        kernel = os.environ.get("VQVAE_TPU_KNN_KERNEL")
    if kernel is None:
        kernel = ("pallas" if approx and jax.default_backend() == "tpu"
                  else "xla")
    if kernel not in ("xla", "pallas"):
        raise ValueError(f"unknown kNN kernel {kernel!r}")
    return kernel


def knn_search(
    z: np.ndarray | jax.Array,
    k: int,
    metric: str = "euclidean",
    query_tile: int | None = None,
    db_tile: int | None = None,
    query_block: int = 131_072,
    approx: bool = False,
    margin: int | None = None,
    recall_target: float | None = None,
    aggregate: bool | None = None,
    mesh=None,
    kernel: str | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """All-pairs exact kNN: returns (distances, indices), each (N, k).

    Self-matches are *included* (distance 0 at the query row, like the raw
    sklearn/FAISS queries before self-stripping); graph assembly strips
    them. ``k`` is capped at N.

    ``VQVAE_TPU_KNN_DEVICE_MAX`` (rows, default 4M) routes larger inputs to
    the native threaded host kernel as an escape hatch.

    ``margin`` (default 4, env ``VQVAE_TPU_KNN_MARGIN``): extra candidates
    kept per database tile before the exact f32 re-rank. Results are exact
    unless more than ``margin`` bf16 near-ties collide per query within one
    tile, in which case any swapped neighbor differs by at most the tie
    spread; raise the margin to cover known near-duplicate cluster sizes.

    ``approx=True`` additionally relaxes per-tile candidate selection to
    ``lax.approx_min_k`` (per-tile candidate recall; reported distances
    stay exact for returned indices). ``recall_target`` (default 0.95,
    env ``VQVAE_TPU_KNN_RECALL``) trades selection speed for candidate
    recall — measured sweep in docs/benchmarks.md.

    ``mesh``: optional `jax.sharding.Mesh`; shards the query axis across
    its devices (database replicated, no collectives).

    ``kernel`` (env ``VQVAE_TPU_KNN_KERNEL``): ``"xla"`` — the scanned
    XLA block kernel above; ``"pallas"`` — the fused Pallas selection
    kernel (ops/pallas_knn.py; the distance stream never leaves VMEM,
    ``recall_target``/``aggregate`` do not apply). Both end in the same
    exact f32 re-rank. Unset, ``approx=True`` on a real TPU picks
    ``"pallas"`` — measured at the 983k north-star shape it beats
    ``approx_min_k`` selection on BOTH speed (16.5s vs 21.6s same
    session) and candidate recall (0.99996 vs 0.99983); everything else
    (exact requests, CPU/interpret hosts) picks ``"xla"``.
    """
    kernel = resolve_knn_kernel(approx, kernel)
    if margin is None:
        margin = int(os.environ.get("VQVAE_TPU_KNN_MARGIN",
                                    8 if kernel == "pallas" else 4))
    if recall_target is None:
        recall_target = float(os.environ.get("VQVAE_TPU_KNN_RECALL", 0.95))
    if query_tile is None:
        query_tile = int(os.environ.get("VQVAE_TPU_KNN_QT", 1024))
    if db_tile is None:
        # pallas 8192: best of the round-5 983k hardware sweep — 9.1-9.5s
        # packed vs 10.9-12.3s at 4096 (docs/benchmarks.md "Round 5:
        # driver-queue captures"; round-3 had picked 4096 over 2048)
        db_tile = int(os.environ.get(
            "VQVAE_TPU_KNN_DT", 8192 if kernel == "pallas" else 32768))
    if aggregate is None:
        aggregate = os.environ.get("VQVAE_TPU_KNN_AGG", "1") == "1"
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
    row_valid = jnp.asarray(np.arange(n_db_pad) < n)

    n_shards = len(mesh.devices.ravel()) if mesh is not None else 1
    block_align = query_tile * n_shards
    block = min(_round_up(n, block_align),
                _round_up(query_block, block_align))
    bins = int(os.environ.get("VQVAE_TPU_KNN_BINS", 1024))
    sel_tile = int(os.environ.get("VQVAE_TPU_KNN_SELTILE", 128))
    # packed keys default ON since the round-5 sweep: 1.2x at matched tiles,
    # 1.35x combined with db_tile 8192, recall unchanged (0.99928); auto-
    # falls back to unpacked when bins land on a non-power-of-two.
    packed = os.environ.get("VQVAE_TPU_KNN_PACKED", "1") == "1"
    if kernel == "pallas":
        # record what the fused kernel will ACTUALLY run (bins/sel_tile
        # adjust to divisibility; packed silently falls back on
        # non-power-of-two bins) so provenance reports don't echo the env
        eff_sel, eff_bins, eff_packed = effective_pallas_params(
            block // n_shards, sel_tile, db_tile, bins, packed)
        KNN_EFFECTIVE.update(kernel=kernel, sel_tile=eff_sel, bins=eff_bins,
                             packed=eff_packed, db_tile=db_tile)
    else:
        KNN_EFFECTIVE.update(kernel=kernel, sel_tile=None, bins=None,
                             packed=False, db_tile=db_tile)
    fn = _build_knn_fn(mesh if n_shards > 1 else None, k, metric, query_tile,
                       db_tile, approx, margin, float(recall_target),
                       bool(aggregate) or not approx,
                       os.environ.get("VQVAE_TPU_KNN_SELDTYPE") == "bf16",
                       kernel=kernel,
                       bins=bins,
                       interpret=(kernel == "pallas"
                                  and jax.default_backend() != "tpu"),
                       sel_tile=sel_tile,
                       packed=packed)
    dists = np.empty((n, k), np.float32)
    idxs = np.empty((n, k), np.int64)
    for s in range(0, n, block):
        e = min(s + block, n)
        q = np.zeros((block, z.shape[1]), np.float32)
        q[:e - s] = zn[s:e]
        qv = np.arange(block) < (e - s)
        d, i = fn(jnp.asarray(q), z_db_j, row_valid, jnp.asarray(qv))
        dists[s:e] = np.asarray(d[:e - s])
        idxs[s:e] = np.asarray(i[:e - s]).astype(np.int64)
    return dists, idxs


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
