"""IVF (inverted-file) kNN — pruned search beyond the reference's brute force.

The brute-force kernel must examine all N^2 candidate distances; at the
983k north-star shape that is ~1e12 distance evaluations, and one VPU
pass over them (~10s) is the selection floor the measured 17-19s sits
near (docs/benchmarks.md, round-3 kNN). IVF prunes instead of scanning:

1. a coarse k-means quantizer (jitted Lloyd on a sample) partitions the
   database into C buckets;
2. bucket occupancy is REBALANCED to a fixed cap on the host (overflow
   points move to their next-nearest bucket with space), so every bucket
   is a dense (cap, D) tile — no skew, no dynamic shapes;
3. queries are processed bucket-by-bucket: all queries of a bucket share
   one probe set (the P nearest buckets by centroid distance, self
   included), so the whole search is C dense
   (cap x P*cap) matmul + top-k tiles — no per-query gathers anywhere.

Each query examines P*cap candidates instead of N: at 983k with C=2048,
P=16 that is ~40x less selection work than the brute kernel. The CPU
analog is FAISS IVFFlat — which the reference never reaches; its FAISS
backend is exact IndexFlatL2 only (reference
src/geo/knn_graph_optimized.py:79-126) — so this mode EXCEEDS the
reference's capability surface. Self-matches are included (the query's
own bucket is always probed), distances are exact f32 for returned
indices (fast-form select + exact re-rank, like ops/knn.py), and recall
is a measured contract (tools/bench_knn.py --ivf), not a hope.
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("n_iter",))
def _lloyd_sample(z: jax.Array, centers0: jax.Array, n_iter: int):
    """Plain Lloyd on a (S, D) sample; returns (C, D) centers."""
    z_sq = (z * z).sum(1)
    n_clusters = centers0.shape[0]

    def body(_, centers):
        d2 = (z_sq[:, None] - 2.0 * (z @ centers.T)
              + (centers * centers).sum(1)[None, :])
        labels = jnp.argmin(d2, axis=1)
        sums = jax.ops.segment_sum(z, labels, num_segments=n_clusters)
        counts = jax.ops.segment_sum(jnp.ones((z.shape[0],), jnp.float32),
                                     labels, num_segments=n_clusters)
        return jnp.where(counts[:, None] > 0,
                         sums / jnp.maximum(counts[:, None], 1.0), centers)

    return jax.lax.fori_loop(0, n_iter, body, centers0)


@functools.partial(jax.jit, static_argnames=("block", "n_choice"))
def _assign_topc(z: jax.Array, centers: jax.Array, block: int,
                 n_choice: int):
    """Top-``n_choice`` nearest centroids per row, blocked over rows."""
    c_sq = (centers * centers).sum(1)
    n_blocks = z.shape[0] // block
    zb = z.reshape(n_blocks, block, -1)

    def step(_, q):
        d2 = ((q * q).sum(1)[:, None] - 2.0 * (q @ centers.T)
              + c_sq[None, :])
        _, idx = jax.lax.top_k(-d2, n_choice)
        return None, idx.astype(jnp.int32)

    _, idx = jax.lax.scan(step, None, zb)
    return idx.reshape(n_blocks * block, n_choice)


def _balance_buckets(choices: np.ndarray, C: int, cap: int) -> np.ndarray:
    """Capacity-constrained assignment: each row takes its best-ranked
    centroid with free space; rows whose every candidate is full spill to
    the globally least-loaded bucket. Returns (N,) final labels."""
    n, n_choice = choices.shape
    counts = np.zeros(C, np.int64)
    labels = np.full(n, -1, np.int64)
    pending = np.arange(n)
    for c in range(n_choice):
        if pending.size == 0:
            break
        want = choices[pending, c]
        # process bucket-by-bucket: take up to the remaining capacity
        order = np.argsort(want, kind="stable")
        want_s = want[order]
        rows_s = pending[order]
        uniq, start = np.unique(want_s, return_index=True)
        end = np.append(start[1:], len(want_s))
        leftover = []
        for b, s, e in zip(uniq, start, end):
            room = cap - counts[b]
            take = min(room, e - s) if room > 0 else 0
            if take > 0:
                labels[rows_s[s:s + take]] = b
                counts[b] += take
            if take < e - s:
                leftover.append(rows_s[s + take:e])
        pending = (np.concatenate(leftover) if leftover
                   else np.empty(0, np.int64))
    for r in pending:  # all candidates full: least-loaded bucket
        b = int(np.argmin(counts))
        labels[r] = b
        counts[b] += 1
    return labels


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def knn_search_ivf(
    z: np.ndarray,
    k: int,
    n_centroids: Optional[int] = None,
    n_probe: Optional[int] = None,
    cap_factor: float = 1.25,
    train_sample: int = 131_072,
    lloyd_iters: int = 10,
    margin: int | None = None,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Self-kNN via balanced IVF; same contract as ``knn_search``
    (self-matches included, exact f32 euclidean distances for returned
    indices). ``n_centroids`` defaults to ~N/480 rounded to a power of
    two; ``n_probe`` (env ``VQVAE_TPU_IVF_PROBE``, default 16) trades
    recall for speed — measure with tools/bench_knn.py before changing.
    """
    if margin is None:
        margin = int(os.environ.get("VQVAE_TPU_KNN_MARGIN", 4))
    if n_probe is None:
        n_probe = int(os.environ.get("VQVAE_TPU_IVF_PROBE", 16))
    z = np.asarray(z, np.float32)
    n, d = z.shape
    if n_centroids is None:
        n_centroids = int(os.environ.get(
            "VQVAE_TPU_IVF_CENTROIDS",
            max(64, 1 << int(np.log2(max(n / 480, 64))))))
    C = min(n_centroids, max(8, n // 8))
    P = min(n_probe, C)
    cap = _round_up(int(np.ceil(n / C * cap_factor)), 8)

    # 1. coarse quantizer on a sample (random init is fine for a coarse
    # quantizer; Lloyd does the work)
    rng = np.random.default_rng(seed)
    s = min(train_sample, n)
    sample = z[rng.choice(n, size=s, replace=False)] if s < n else z
    init = sample[rng.choice(s, size=C, replace=False)]
    centers = _lloyd_sample(jnp.asarray(sample), jnp.asarray(init),
                            lloyd_iters)

    # 2. top-4 candidate buckets per row (blocked), balanced on host
    n_choice = min(4, C)
    block = 65536 if n >= 65536 else _round_up(n, 8)
    n_pad = _round_up(n, block)
    z_pad = z if n_pad == n else np.concatenate(
        [z, np.zeros((n_pad - n, d), np.float32)])
    choices = np.asarray(_assign_topc(jnp.asarray(z_pad), centers, block,
                                      n_choice))[:n]
    labels = _balance_buckets(choices, C, cap)

    # 3. dense bucket layout (C, cap): ids (-1 pad) + coordinates
    order = np.argsort(labels, kind="stable")
    counts = np.bincount(labels, minlength=C)
    bucket_ids = np.full((C, cap), -1, np.int32)
    starts = np.concatenate([[0], np.cumsum(counts)])
    for b in range(C):  # O(C) slice-assigns, cheap
        bucket_ids[b, :counts[b]] = order[starts[b]:starts[b + 1]]
    ids_j = jnp.asarray(bucket_ids)
    bz = jnp.asarray(z)[jnp.maximum(ids_j, 0)]  # (C, cap, D); pad rows
    # carry row-0 coords but are masked out by id validity everywhere

    # 4. probe table: P buckets per bucket, ranked by how often they occur
    # in the MEMBERS' own top-n_choice centroid lists (captures boundary
    # spread better than plain centroid-centroid distance: a bucket's
    # members vote for where their neighborhoods actually extend),
    # backfilled with centroid-distance order; self always first
    c_np = np.asarray(centers)
    cd = ((c_np * c_np).sum(1)[:, None] - 2.0 * (c_np @ c_np.T)
          + (c_np * c_np).sum(1)[None, :])
    cd_order = np.argsort(cd, axis=1)
    votes = np.zeros((C, C), np.int64)
    flat_b = np.repeat(labels, n_choice)
    np.add.at(votes, (flat_b, choices.reshape(-1)), 1)
    probe_np = np.empty((C, P), np.int32)
    for g in range(C):
        ranked = np.argsort(-votes[g], kind="stable")
        ranked = ranked[votes[g][ranked] > 0]
        take = [g] + [int(b) for b in ranked if b != g][:P - 1]
        for b in cd_order[g]:  # backfill sparse vote rows
            if len(take) >= P:
                break
            if b not in take:
                take.append(int(b))
        probe_np[g] = take[:P]
    probe_tab = jnp.asarray(probe_np)

    # 5. bucket-by-bucket search: one dense tile per bucket
    k_eff = min(k, n)
    out_d, out_i = _ivf_search(bz, ids_j, probe_tab, k_eff,
                               min(k_eff + margin, P * cap))

    # 6. scatter back to original row order
    dists = np.empty((n, k_eff), np.float32)
    idxs = np.empty((n, k_eff), np.int64)
    od = np.asarray(out_d).reshape(C * cap, k_eff)
    oi = np.asarray(out_i).reshape(C * cap, k_eff)
    flat_ids = bucket_ids.reshape(C * cap)
    valid = flat_ids >= 0
    dists[flat_ids[valid]] = od[valid]
    idxs[flat_ids[valid]] = oi[valid]
    return dists, idxs


@functools.partial(jax.jit, static_argnames=("k", "k_sel"))
def _ivf_search(bz: jax.Array, ids: jax.Array, probe_tab: jax.Array,
                k: int, k_sel: int):
    C, cap, D = bz.shape
    P = probe_tab.shape[1]

    def bucket_step(_, g):
        q = bz[g]                       # (cap, D)
        qv = ids[g] >= 0
        q = jnp.where(qv[:, None], q, 0.0)
        probes = probe_tab[g]           # (P,)
        cand_z = bz[probes].reshape(P * cap, D)
        cand_ids = ids[probes].reshape(P * cap)
        cvalid = cand_ids >= 0
        cz = jnp.where(cvalid[:, None], cand_z, 0.0)
        d2 = ((q * q).sum(1)[:, None]
              - 2.0 * jnp.dot(q, cz.T,
                              preferred_element_type=jnp.float32)
              + (cz * cz).sum(1)[None, :])
        d2 = jnp.where(cvalid[None, :], d2, jnp.inf)
        _, sel = jax.lax.top_k(-d2, k_sel)          # (cap, k_sel)
        # exact f32 re-rank of the selected candidates (the fast form
        # cancels in bf16 matmul passes, same as ops/knn.py)
        pick = jnp.take_along_axis(
            jnp.broadcast_to(cand_ids[None, :], d2.shape), sel, axis=1)
        cand = cz[sel]                              # (cap, k_sel, D)
        diff = q[:, None, :] - cand
        exact = jnp.sqrt(jnp.maximum((diff * diff).sum(-1), 0.0))
        exact = jnp.where(pick >= 0, exact, jnp.inf)
        neg, order = jax.lax.top_k(-exact, k)
        best_i = jnp.take_along_axis(pick, order, axis=1)
        best_d = jnp.where(qv[:, None], -neg, jnp.inf)
        return None, (best_d, best_i)

    _, (dd, ii) = jax.lax.scan(bucket_step, None,
                               jnp.arange(C, dtype=jnp.int32))
    return dd, ii
