"""Degree-bucketed (ELL-style) graph relaxation — scatter-free sweeps.

TPU-native replacement for the reference's multi-source
``scipy.sparse.csgraph.dijkstra`` hot loop (reference
src/geo/geo_shortest_paths.py:24-51); same (N, K) distance-matrix
contract as ops/shortest_paths.py, different engine.

The edge-list relaxation reduces with ``segment_min`` (a scatter);
TPU/XLA executes scatters far below HBM bandwidth. This representation
removes the scatter entirely: nodes are grouped into geometric in-degree
buckets (see ``_cap_ladder``), each bucket stores a dense ``(N_b, deg)``
neighbor/weight matrix
(padded with +inf weights), and a relaxation step for one row chunk is

    cand = min_axis1( D[nbr_chunk] + w_chunk )        # gathers
    D[chunk_rows] = min(D[chunk_rows], cand)           # contiguous update

— pure gathers, vector mins, and contiguous dynamic-slice updates, which
XLA maps onto the VPU at near-bandwidth with no scatters.

The sweep is **chunk-sequential Gauss-Seidel**: the distance matrix lives
in bucket-row (permuted) layout for the whole solve, each chunk's update is
written back before the next chunk is relaxed, and the chunk order
alternates forward/backward between sweeps. Later chunks therefore see
earlier chunks' fresh values within the same sweep, so distances propagate
many hops per sweep along the node order (BFS-relabeled by the callers)
instead of exactly one hop as in a Jacobi sweep — the same alternating-GS
trick the edge-list engine uses, without its segment_min scatter. The
while_loop exits as soon as no distance improves.

Warm starts: ``d0`` may carry any per-entry upper bounds on the true
distances (not just the inf/0 cold start); relaxation is monotone from
above, so the fixed point is exact. The k-means++ driver exploits this to
re-use the running nearest-center distances across rounds.
"""
from __future__ import annotations

import functools
import os
import time
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_INF = np.float32(np.inf)

# set VQVAE_TPU_ELL_STATS=1 to append per-solve records here (sweep count,
# wall time, effective bytes/GB/s) — used by bench.py's utilization report.
# Off by default: reading the sweep counter forces a host sync per solve.
ELL_STATS: list = []


class BucketedGraph(NamedTuple):
    """Degree-bucketed in-neighbor structure (static shapes per bucket).

    Rows across all buckets are concatenated into one padded "row space";
    ``inv_perm`` maps node id -> row, ``perm_nodes`` maps row -> node id
    (dummy pad rows gather row 0; their weights are +inf so they never
    influence a distance). ``nbrs`` stores *row* ids so relaxation gathers
    stay in row space end to end.
    """

    nbrs: Tuple[jax.Array, ...]     # per bucket: (N_b, deg_b) int32 ROW ids
    wts: Tuple[jax.Array, ...]      # per bucket: (N_b, deg_b) f32 (+inf pad)
    inv_perm: jax.Array             # (N,) int32: node -> row in concat order
    perm_nodes: jax.Array           # (N_pad,) int32: row -> node (pad -> 0)
    n_nodes: int

    @staticmethod
    def from_csr(W, assume_symmetric: bool = False) -> "BucketedGraph":
        """Build from a scipy sparse matrix with undirected traversal
        semantics (min stored weight per unordered pair, both directions —
        same contract as shortest_paths.EdgeList.from_csr).

        Symmetric matrices (the common case: every graph the builders
        produce) take a fast path — each CSR row IS the node's in-neighbor
        list, so the O(E log E) pair-dedup sort is skipped entirely.
        ``assume_symmetric`` additionally skips the O(E) symmetry *check*
        (~2.5 s at 30M edges on this 1-core host) — pass it when the caller
        constructed the graph as ``W + W.T`` / ``W.maximum(W.T)``."""
        n = W.shape[0]
        Wc = W.tocsr()
        if assume_symmetric or (Wc != Wc.T).nnz == 0:  # O(E) check
            counts = np.diff(Wc.indptr).astype(np.int64)
            # drop self-loops (zero-weight diagonal entries are edges to
            # self and never change distances; keep simple: they are rare
            # because the builders eliminate the diagonal)
            return BucketedGraph._from_sorted(
                Wc.indices.astype(np.int32), Wc.data.astype(np.float32),
                counts, n)
        coo = W.tocoo()
        lo = np.minimum(coo.row, coo.col).astype(np.int64)
        hi = np.maximum(coo.row, coo.col).astype(np.int64)
        keep = lo != hi
        key = lo[keep] * n + hi[keep]
        data = coo.data[keep].astype(np.float32)
        order = np.argsort(key, kind="stable")
        key_s, w_s = key[order], data[order]
        uniq, start = np.unique(key_s, return_index=True)
        w_min = np.minimum.reduceat(w_s, start) if len(w_s) else w_s
        iu = (uniq // n).astype(np.int32)
        ju = (uniq % n).astype(np.int32)
        src = np.concatenate([iu, ju])
        dst = np.concatenate([ju, iu])
        w = np.concatenate([w_min, w_min])
        return BucketedGraph.from_edges(src, dst, w, n)

    @staticmethod
    def from_edges(src, dst, w, n_nodes: int) -> "BucketedGraph":
        src = np.asarray(src, np.int32)
        dst = np.asarray(dst, np.int32)
        w = np.asarray(w, np.float32)
        order = np.argsort(dst, kind="stable")
        src, w = src[order], w[order]
        counts = np.bincount(dst, minlength=n_nodes).astype(np.int64)
        return BucketedGraph._from_sorted(src, w, counts, n_nodes)

    @staticmethod
    def _from_sorted(src: np.ndarray, w: np.ndarray, counts: np.ndarray,
                     n_nodes: int) -> "BucketedGraph":
        """Build from dst-sorted in-edge arrays (src[i], w[i] grouped per
        destination node with per-node ``counts``)."""
        return _from_sorted_impl(src, w, counts, n_nodes)


def _cap_ladder(max_deg: int) -> list:
    """Degree caps for the buckets, geometric with growth factor
    ``VQVAE_TPU_ELL_CAPGROW`` (default 1.5), rounded to multiples of 4.

    The sweep's dominant traffic is the K-wide distance-row gather per
    edge SLOT (padded included), so tighter caps cut both the per-sweep
    gather bytes and the H2D push of the padded arrays. pow2 (grow=2)
    pads a k=10 kNN-union graph (mean degree ~16) to ~1.54x nnz slots;
    grow=1.5 lands ~1.28x with one extra bucket per sweep — A/B'd on v5e
    (docs/benchmarks.md round-5 cap-ladder note)."""
    grow = float(os.environ.get("VQVAE_TPU_ELL_CAPGROW", 1.5))
    caps = [8]
    while caps[-1] < max(max_deg, 8):
        nxt = max(caps[-1] + 4, int(caps[-1] * grow))
        caps.append((nxt + 3) // 4 * 4)
    return caps


def _from_sorted_impl(src: np.ndarray, w: np.ndarray, counts: np.ndarray,
                      n_nodes: int) -> "BucketedGraph":
    """Build from dst-sorted in-edge arrays (src[i], w[i] grouped per
    destination node with per-node ``counts``)."""
    if (w < 0).any():
        raise ValueError("Negative weights")
    starts = np.concatenate([[0], np.cumsum(counts)])[:n_nodes]
    e_total = len(src)

    max_deg = int(counts.max()) if n_nodes else 0
    caps = _cap_ladder(max_deg)
    caps_arr = np.asarray(caps)
    bucket_of = np.searchsorted(caps_arr, np.maximum(counts, 1))

    # merge sparsely-populated buckets upward: every bucket costs a
    # scan + its own relaxation program in the sweep, so a bucket worth
    # only a few row-chunks is pure overhead — promote its rows to the
    # next cap (their extra slots are +inf-padded, adding gather traffic
    # only for those few rows)
    min_rows = int(os.environ.get("VQVAE_TPU_ELL_MINROWS", 8192))
    sizes = np.bincount(bucket_of, minlength=len(caps))
    for b in range(len(caps) - 1):
        if 0 < sizes[b] < min_rows:
            bucket_of[bucket_of == b] = b + 1
            sizes[b + 1] += sizes[b]
            sizes[b] = 0

    # pass 1 (cheap, O(N)): bucket membership, row offsets, inv_perm —
    # so pass 2 can gather ROW ids directly (one fused gather per
    # bucket, instead of gathering node ids and re-gathering through
    # inv_perm over the padded arrays afterwards)
    node_order, row_offsets, pads = [], [], []
    offset = 0
    for b, cap in enumerate(caps):
        nodes_b = np.nonzero(bucket_of == b)[0]
        node_order.append(nodes_b)
        row_offsets.append(offset)
        chunk_b = _row_chunk(nodes_b.size)
        n_pad = max(chunk_b, ((nodes_b.size + chunk_b - 1) // chunk_b)
                    * chunk_b) if nodes_b.size else 0
        pads.append(n_pad)
        offset += n_pad

    inv_perm = np.empty(n_nodes, np.int32)
    for b, nodes_b in enumerate(node_order):
        if nodes_b.size:
            inv_perm[nodes_b] = (row_offsets[b]
                                 + np.arange(nodes_b.size)).astype(np.int32)
    perm_nodes = np.zeros(max(offset, 1), np.int32)
    perm_nodes[inv_perm] = np.arange(n_nodes, dtype=np.int32)
    src_rows = inv_perm[src] if e_total else src  # one O(E) map

    # pass 2: padded (rows, cap) neighbor/weight matrices per bucket —
    # one threaded native memcpy pass when available (8 s -> sub-second
    # at 30M edges on this host), multi-pass numpy otherwise
    try:
        from .. import native

        fill = native.ell_fill_bucket if native.available() else None
    except ImportError:
        fill = None
    nbrs, wts = [], []
    w = np.ascontiguousarray(w, np.float32)
    src_rows = np.ascontiguousarray(src_rows, np.int32)
    for b, cap in enumerate(caps):
        nodes_b = node_order[b]
        if nodes_b.size == 0:
            nbrs.append(jnp.zeros((0, cap), jnp.int32))
            wts.append(jnp.zeros((0, cap), jnp.float32))
            continue
        n_pad = pads[b]
        if fill is not None and e_total:
            nb, wb = fill(src_rows, w, starts[nodes_b], counts[nodes_b],
                          n_pad, cap)
        else:
            offs = starts[nodes_b][:, None] + np.arange(cap)[None, :]
            valid = np.arange(cap)[None, :] < counts[nodes_b][:, None]
            offs = np.clip(offs, 0, max(e_total - 1, 0))
            nb = np.where(valid, src_rows[offs] if e_total else 0,
                          0).astype(np.int32)
            wb = np.where(valid, w[offs] if e_total else _INF,
                          _INF).astype(np.float32)
            if n_pad > nodes_b.size:  # dummy rows: row 0, +inf weights
                pad_rows = n_pad - nodes_b.size
                nb = np.concatenate([nb,
                                     np.zeros((pad_rows, cap), np.int32)])
                wb = np.concatenate([wb, np.full((pad_rows, cap), _INF,
                                                 np.float32)])
        nbrs.append(jnp.asarray(nb))
        wts.append(jnp.asarray(wb))

    return BucketedGraph(
        nbrs=tuple(nbrs),
        wts=tuple(wts),
        inv_perm=jnp.asarray(inv_perm),
        perm_nodes=jnp.asarray(perm_nodes[:offset] if offset
                               else perm_nodes),
        n_nodes=int(n_nodes),
    )


def _deg_block(chunk: int, deg: int, k: int) -> int:
    """Neighbor columns gathered per relaxation step (env
    ``VQVAE_TPU_ELL_DEGBLOCK``: 0 = auto by a ~64 MB buffer cap, 1 = the
    one-column-at-a-time formulation, N = force N)."""
    forced = int(os.environ.get("VQVAE_TPU_ELL_DEGBLOCK", 0))
    if forced >= 1:
        b = forced
    else:
        # budget tuned on v5e at 983k/K=512: (chunk 8192, B=2) ran the
        # sweep at 103.9 GB/s vs 76.6 at B=1 and 100.5 at (4096, B=4) —
        # docs/benchmarks.md "Round 3: ELL gather A/B"
        budget = 10_000_000  # f32 elements (~40 MB live gather buffer)
        b = max(1, budget // max(chunk * k, 1))
    b = min(b, deg)
    while deg % b:  # caps are multiples of 4, so halving lands on a divisor
        b //= 2
    return max(b, 1)


def _row_chunk(n_rows: int) -> int:
    """Row-chunk size bounding the sweep's live buffers to (chunk, K)
    (env ``VQVAE_TPU_ELL_CHUNK`` overrides the 16384 cap)."""
    if n_rows <= 0:
        return 1
    cap = int(os.environ.get("VQVAE_TPU_ELL_CHUNK", 8192))
    c = 1
    while c < min(n_rows, cap):
        c *= 2
    return c


@functools.partial(jax.jit, donate_argnums=(4,), static_argnums=(6,))
def _ell_run(nbrs, wts, perm_nodes, inv_perm, d0, max_iters,
             active: bool = True):
    """Gauss-Seidel relaxation in permuted (bucket-row) layout.

    One sweep scans each bucket's row chunks in order (direction alternates
    between sweeps), relaxing a chunk against the LIVE distance matrix and
    writing it back before the next chunk runs — so improvements propagate
    along the row order within a single sweep.

    ``active``: chunk-level frontier skipping. Two row masks are kept —
    ``cp`` (rows whose distance improved during the previous sweep) and
    ``cc`` (improvements so far in this sweep) — and a chunk is relaxed
    only when some in-neighbor of its rows is marked in either mask
    (its candidates ``d[nbr] + w`` cannot have changed otherwise). Any
    improvement reaches every dependent chunk within two sweeps (same
    sweep via ``cc`` for chunks later in the order, next sweep via ``cp``
    for the rest), so the fixed point is exactly the full-relaxation one;
    the loop still exits only after a sweep with no improvement anywhere.
    A skipped chunk costs two mask gathers (~1% of a relax at K=512), so
    warm-start convergence tails — where improvement regions are small —
    stop paying for full sweeps. Returns per-bucket relaxed-chunk counts
    for the bandwidth accounting.
    """
    n_rows = perm_nodes.shape[0]
    k = d0.shape[1]
    d_perm = d0[perm_nodes]  # (N_pad, K): row-space distances

    offsets = np.cumsum([0] + [int(nb.shape[0]) for nb in nbrs])
    n_buckets = len(nbrs)

    def sweep(d_perm, cp, cc, counts, reverse):
        changed = jnp.bool_(False)
        for b, (nb_all, wb_all) in enumerate(zip(nbrs, wts)):
            rows, deg = nb_all.shape
            if rows == 0:
                continue
            chunk = _row_chunk(rows)
            n_chunks = rows // chunk
            row_off = int(offsets[b])

            # gather B neighbor columns per step: fewer, larger row gathers
            # keep the VPU's gather pipeline fed (the sweep is gather-bound;
            # docs/benchmarks.md). B is capped so the (chunk, B, K) live
            # buffer stays ~64 MB.
            deg_block = _deg_block(chunk, deg, k)

            def step(carry, i, b=b, nb_all=nb_all, wb_all=wb_all,
                     chunk=chunk, n_chunks=n_chunks, row_off=row_off,
                     deg=deg, deg_block=deg_block):
                d_perm, cc, counts, changed = carry
                idx = jnp.where(reverse, n_chunks - 1 - i, i)
                nb = jax.lax.dynamic_slice(nb_all, (idx * chunk, 0),
                                           (chunk, deg))

                def relax(args):
                    d_perm, cc, counts = args
                    wb = jax.lax.dynamic_slice(wb_all, (idx * chunk, 0),
                                               (chunk, deg))
                    cur = jax.lax.dynamic_slice(
                        d_perm, (row_off + idx * chunk, 0), (chunk, k))

                    if deg_block > 1:
                        nbb = nb.reshape(chunk, deg // deg_block, deg_block)
                        wbb = wb.reshape(chunk, deg // deg_block, deg_block)

                        def relax_j(j, acc):
                            cand = (d_perm[nbb[:, j]]
                                    + wbb[:, j][:, :, None])  # (chunk, B, K)
                            return jnp.minimum(acc, cand.min(axis=1))

                        new = jax.lax.fori_loop(0, deg // deg_block, relax_j,
                                                cur)
                    else:
                        def relax_j(j, acc):
                            cand = d_perm[nb[:, j]] + wb[:, j][:, None]
                            return jnp.minimum(acc, cand)

                        new = jax.lax.fori_loop(0, deg, relax_j, cur)
                    row_ch = jnp.any(new < cur, axis=1)
                    if active:
                        cc = jax.lax.dynamic_update_slice(
                            cc, row_ch, (row_off + idx * chunk,))
                    d_perm = jax.lax.dynamic_update_slice(
                        d_perm, new, (row_off + idx * chunk, 0))
                    return d_perm, cc, counts.at[b].add(1), jnp.any(row_ch)

                if active:
                    is_active = jnp.logical_or(jnp.any(cp[nb]),
                                               jnp.any(cc[nb]))
                    d_perm, cc, counts, ch = jax.lax.cond(
                        is_active, relax,
                        lambda a: (*a, jnp.bool_(False)),
                        (d_perm, cc, counts))
                else:
                    d_perm, cc, counts, ch = relax((d_perm, cc, counts))
                changed = jnp.logical_or(changed, ch)
                return (d_perm, cc, counts, changed), None

            (d_perm, cc, counts, changed), _ = jax.lax.scan(
                step, (d_perm, cc, counts, changed), jnp.arange(n_chunks))
        return d_perm, cc, counts, changed

    def cond(state):
        _, _, _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    def body(state):
        d_perm, cp, counts, _, it = state
        cc = jnp.zeros((n_rows,), jnp.bool_)
        d_perm, cc, counts, changed = sweep(d_perm, cp, cc, counts,
                                            it % 2 == 1)
        return d_perm, cc, counts, changed, it + 1

    d_perm, _, counts, _, iters = jax.lax.while_loop(
        cond, body, (d_perm, jnp.ones((n_rows,), jnp.bool_),
                     jnp.zeros((n_buckets,), jnp.int32),
                     jnp.bool_(True), 0))
    return d_perm[inv_perm], iters, counts


def multi_source_shortest_paths_ell(
    graph: BucketedGraph,
    sources: np.ndarray,
    d0: Optional[jax.Array] = None,
    max_iters: Optional[int] = None,
    return_iters: bool = False,
    mesh=None,
):
    """(N, K) distances via scatter-free bucketed Gauss-Seidel relaxation.

    ``d0``: optional (N, K) per-entry upper bounds to warm-start from (the
    cold start is +inf everywhere, 0 at each source's own column).

    ``mesh``: >1-device meshes shard the K (source) axis of the distance
    matrix across chips. Every op in the sweep is K-elementwise — the
    neighbor gathers index the *node* axis with replicated indices — so
    GSPMD partitions the whole while-loop without collectives on distance
    data; the only cross-chip traffic is the per-chunk ``pred[chunk]``
    row-changed any-reduce (~N bool bytes per sweep, 1/(4K) of the gather
    bytes — pinned by the HLO test in tests/test_sharded_kernels.py).
    """
    sources = jnp.asarray(sources, jnp.int32)
    k = sources.shape[0]
    n = graph.n_nodes
    if d0 is None:
        d0 = jnp.full((n, k), jnp.inf)
        d0 = d0.at[sources, jnp.arange(k)].set(0.0)
    n_shards = len(mesh.devices.ravel()) if mesh is not None else 1
    if n_shards > 1 and int(k) % n_shards == 0:  # uneven K: stay replicated
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        d0 = jax.device_put(d0, NamedSharding(mesh, P(None, DATA_AXIS)))
    if max_iters is None:
        max_iters = n + 1
    # default OFF — measured NEGATIVE at the production shape (983k/K=512,
    # rounds=4, v5e): k-means|| rounds relax 128 fresh sources whose
    # improvement regions span the whole graph, so chunk active fractions
    # sit at 0.89-1.0 (ceiling ~10%), while the lax.cond skip machinery
    # costs 3.6x (solver 51.4s vs 14.3s, 9 vs 35 GB/s same session) —
    # docs/benchmarks.md round-4. Kept opt-in for narrow/late-frontier
    # workloads (e.g. single-source warm refreshes).
    active = os.environ.get("VQVAE_TPU_ELL_ACTIVE", "0") == "1"
    record = os.environ.get("VQVAE_TPU_ELL_STATS") == "1"
    t0 = time.perf_counter() if record else 0.0
    d, iters, counts = _ell_run(graph.nbrs, graph.wts, graph.perm_nodes,
                                graph.inv_perm, d0, jnp.int32(max_iters),
                                active)
    if record:
        it = int(iters)  # device-to-host copy: the only reliable fence here
        dt = time.perf_counter() - t0
        counts = np.asarray(counts)
        kk = int(k)
        # relaxed chunk of bucket b: gather a (K,) distance row + weight per
        # edge slot, read + write its (chunk, K) rows; skipped chunk: the
        # neighbor slice + two bool mask gathers
        swept = skipped = 0
        visits = relaxed = 0
        for b, nb in enumerate(graph.nbrs):
            rows, deg = int(nb.shape[0]), int(nb.shape[1])
            if rows == 0:
                continue
            chunk = _row_chunk(rows)
            n_chunks = rows // chunk
            slots = chunk * deg
            n_rel = int(counts[b])
            per_relax = (slots * (kk * 4 + 8 + (2 if active else 0))
                         + 2 * chunk * kk * 4)
            swept += n_rel * per_relax
            n_skip = it * n_chunks - n_rel
            skipped += max(n_skip, 0) * slots * 6
            visits += it * n_chunks
            relaxed += n_rel
        swept += skipped
        ELL_STATS.append({"iters": it, "seconds": dt, "k": kk,
                          "bytes": swept,
                          "chunk_visits": visits,
                          "chunk_relaxed": relaxed,
                          "active_frac": relaxed / max(visits, 1),
                          "gbps": swept / max(dt, 1e-9) / 1e9})
    return (d, iters) if return_iters else d
