"""Multi-source shortest paths as batched relaxation sweeps on TPU.

This replaces the reference's hot loop — scipy's sequential Dijkstra over a
CSR graph (reference src/geo/geo_shortest_paths.py:24-63, called with K=512
sources from kmeans_optimized.py:97 and 511 more times sequentially from
kpp_initialization_graph) — with a **source-batched Bellman-Ford**: the
distance matrix ``D`` of shape (N, K) is relaxed for *all K sources
simultaneously* each sweep,

    D[dst, :] = min(D[dst, :], min over in-edges (D[src, :] + w))

implemented as an edge-chunked gather + ``segment_min`` so each sweep is a
dense, static-shape XLA program (gathers and scatter-mins stream through
HBM; no data-dependent control flow). The sweep loop is a
``lax.while_loop`` that exits as soon as no distance improves, so the
iteration count is the graph's weighted hop diameter, not N.

Scaling axis: K (sources) — shard ``D``'s columns across the device mesh
(each chip relaxes its own source slice over a replicated edge list with no
per-sweep collectives). This is the framework's sequence-parallelism analog
(SURVEY.md §2.3).

Edge-list convention: directed edges (src, dst, w); for the undirected
graphs built by `ops.graph` both directions are present. Arrays are padded
to a static size with w=+inf edges, which can never lower a distance.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

_INF = jnp.float32(jnp.inf)


class EdgeList(NamedTuple):
    """Static-shape directed edge list on device."""

    src: jax.Array  # (E,) int32
    dst: jax.Array  # (E,) int32
    w: jax.Array    # (E,) float32 (+inf for padding)
    n_nodes: int
    dst_sorted: bool = False  # True when edges are sorted by destination

    @staticmethod
    def from_arrays(src, dst, w, n_nodes: int, pad_multiple: int = 8192) -> "EdgeList":
        src = np.asarray(src, np.int32)
        dst = np.asarray(dst, np.int32)
        w = np.asarray(w, np.float32)
        if (w < 0).any():
            raise ValueError("Negative weights")
        dst_sorted = bool(len(dst) == 0 or (dst[:-1] <= dst[1:]).all())
        e = len(src)
        e_pad = max(pad_multiple, ((e + pad_multiple - 1) // pad_multiple) * pad_multiple)
        if e_pad > e:
            # pad with self-loops on the LAST node so dst-sortedness holds;
            # +inf weight means they can never lower a distance
            pad_node = np.int32(max(n_nodes - 1, 0))
            src = np.concatenate([src, np.full(e_pad - e, pad_node, np.int32)])
            dst = np.concatenate([dst, np.full(e_pad - e, pad_node, np.int32)])
            w = np.concatenate([w, np.full(e_pad - e, np.inf, np.float32)])
        return EdgeList(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w),
                        int(n_nodes), dst_sorted)

    @staticmethod
    def from_csr(W, pad_multiple: int = 8192) -> "EdgeList":
        """Build from a scipy.sparse matrix, symmetrizing to both directions
        (matching scipy dijkstra's ``directed=False`` semantics: traversal
        may use min(W[i,j], W[j,i]) in either direction).

        Edges are sorted by destination so the relaxation's segment_min can
        use ``indices_are_sorted=True`` (a sorted-segment reduction instead
        of a scatter) and chunk-sequential sweeps propagate Gauss-Seidel
        style along the node order."""
        from scipy import sparse

        if not sparse.issparse(W):
            raise TypeError("W must be a scipy sparse matrix")
        if W.shape[0] != W.shape[1]:
            raise ValueError("W must be square")
        # deduplicate to one undirected edge per pair with the min stored
        # weight (scipy's directed=False traversal may use either stored
        # direction) — expanding a symmetric CSR naively stores every edge
        # twice and doubles relaxation traffic.
        n = W.shape[0]
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
        order = np.argsort(dst, kind="stable")
        return EdgeList.from_arrays(src[order], dst[order], w[order],
                                    n, pad_multiple)


@functools.partial(jax.jit, static_argnames=("n_nodes", "chunk",
                                              "sorted_chunks"))
def _bellman_ford(
    src: jax.Array,
    dst: jax.Array,
    w: jax.Array,
    d0: jax.Array,  # (N, K) initial distances
    n_nodes: int,
    chunk: int,
    max_iters: jax.Array,  # traced: only bounds the while_loop condition
    sorted_chunks: bool,
) -> jax.Array:
    e_pad = src.shape[0]
    n_chunks = e_pad // chunk
    src_c = src.reshape(n_chunks, chunk)
    dst_c = dst.reshape(n_chunks, chunk)
    w_c = w.reshape(n_chunks, chunk)

    def sweep(d, reverse):
        def chunk_step(d, i):
            idx = jnp.where(reverse, n_chunks - 1 - i, i)
            s = src_c[idx]
            t = dst_c[idx]
            wc = w_c[idx]
            contrib = d[s] + wc[:, None]  # (chunk, K)
            relax = jax.ops.segment_min(contrib, t, num_segments=n_nodes,
                                        indices_are_sorted=sorted_chunks)
            return jnp.minimum(d, relax), None

        d, _ = jax.lax.scan(chunk_step, d, jnp.arange(n_chunks))
        return d

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    def body(state):
        d, _, it = state
        # alternate sweep direction (Gauss-Seidel over chunk order):
        # forward sweeps resolve paths aligned with the node order, backward
        # sweeps the rest — together they cut the sweep count on ordered
        # (e.g. BFS-relabeled) graphs by orders of magnitude vs Jacobi.
        d_new = sweep(d, it % 2 == 1)
        changed = jnp.any(d_new < d)
        return d_new, changed, it + 1

    d_final, _, iters = jax.lax.while_loop(cond, body, (d0, jnp.bool_(True), 0))
    return d_final, iters


def multi_source_shortest_paths(
    edges: EdgeList,
    sources: np.ndarray | jax.Array,
    unweighted: bool = False,
    chunk: int = 262_144,
    max_iters: Optional[int] = None,
    d0: Optional[jax.Array] = None,
    return_iters: bool = False,
) -> jax.Array:
    """Shortest-path distances from each source to every node.

    Returns D of shape (N, K) float32 (note: transposed vs scipy's (K, N) —
    callers in this package use node-major layout; the `geo` compat wrapper
    transposes). Unreachable nodes get +inf.

    ``d0`` lets callers warm-start (e.g. incremental k-means++ rounds where
    only new sources need relaxing).
    """
    sources = jnp.asarray(sources, jnp.int32)
    if sources.ndim != 1 or sources.shape[0] == 0:
        raise ValueError("sources must be a non-empty 1-D index array")
    k = sources.shape[0]
    n = edges.n_nodes
    if d0 is None:
        d0 = jnp.full((n, k), _INF)
        d0 = d0.at[sources, jnp.arange(k)].set(0.0)
    w = jnp.where(jnp.isfinite(edges.w), jnp.float32(1.0), _INF) if unweighted else edges.w
    chunk = min(chunk, edges.src.shape[0])
    if edges.src.shape[0] % chunk != 0:
        chunk = int(np.gcd(edges.src.shape[0], chunk))
    if max_iters is None:
        max_iters = n + 1
    d, iters = _bellman_ford(edges.src, edges.dst, w, d0, n, chunk,
                             jnp.int32(max_iters), bool(edges.dst_sorted))
    return (d, iters) if return_iters else d


def single_source_shortest_paths(
    edges: EdgeList, source: int, unweighted: bool = False, **kw
) -> jax.Array:
    """1-D distances from one source (shape (N,))."""
    d = multi_source_shortest_paths(edges, np.asarray([source]), unweighted, **kw)
    return d[:, 0]


def distances_between(
    edges: EdgeList,
    sources,
    targets,
    unweighted: bool = False,
    **kw,
) -> jax.Array:
    """Compact (S, T) distance matrix (reference geo_shortest_paths.py:66-76
    semantics: full multi-source pass then sub-select target columns)."""
    sources = np.asarray(sources, np.int64)
    targets = np.asarray(targets, np.int64)
    if sources.size == 0 or targets.size == 0:
        raise ValueError("sources and targets must be non-empty.")
    d = multi_source_shortest_paths(edges, sources, unweighted, **kw)  # (N, S)
    return d[jnp.asarray(targets)].T  # (S, T)
