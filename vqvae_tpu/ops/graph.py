"""kNN latent-graph construction and connectivity utilities.

API parity with the reference graph layer (reference
src/geo/knn_graph_optimized.py): exact kNN -> sparse CSR adjacency with
``mutual`` (elementwise min / intersection) or ``union`` (max)
symmetrization, ``distance`` vs ``connectivity`` weight modes, self-edge
stripping, LCC masking, and connectivity stats. The neighbor search itself
runs on TPU (`ops.knn`); CSR assembly and component bookkeeping are O(E)
host numpy/scipy (the reference's own backend for those steps).
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np
from scipy import sparse
from scipy.sparse.csgraph import connected_components

from .knn import knn_search


def _native_assemble_min() -> int:
    """Directed-entry count above which CSR assembly routes to the native
    one-pass kernel (env ``VQVAE_TPU_ASSEMBLE_NATIVE_MIN``; tests set it
    low to exercise the routed path on small graphs)."""
    import os

    return int(os.environ.get("VQVAE_TPU_ASSEMBLE_NATIVE_MIN", 1_000_000))


def _assemble(distances: np.ndarray, indices: np.ndarray, n: int,
              mode: str, sym: str) -> sparse.csr_matrix:
    if distances.size >= _native_assemble_min():
        # one native pass instead of 4 single-core scipy passes (~8 s ->
        # ~1 s at 10M edges on this host); scipy below stays as the
        # small-graph path and the oracle (tests/test_knn_graph.py)
        try:
            from .. import native

            if native.available():
                return native.knn_assemble(distances, indices, n, mode, sym)
        except ImportError:
            pass
    data = distances.ravel() if mode == "distance" else np.ones(distances.size, np.float32)
    rows = np.repeat(np.arange(n), indices.shape[1])
    cols = indices.ravel()
    W = sparse.csr_matrix((data.astype(np.float32), (rows, cols)), shape=(n, n))
    if sym == "mutual":
        W = W.minimum(W.T)
    elif sym == "union":
        W = W.maximum(W.T)
    else:
        raise ValueError(f"Invalid symmetry mode: {sym}")
    W.setdiag(0.0)
    W.eliminate_zeros()
    return W


def build_knn_graph(
    z: np.ndarray,
    k: int = 10,
    metric: str = "euclidean",
    mode: str = "distance",
    sym: str = "mutual",
    approx: bool = False,
    mesh=None,
) -> Tuple[sparse.csr_matrix, Dict[str, np.ndarray]]:
    """Exact kNN graph. Returns (CSR adjacency, {"distances", "indices"}).

    Semantics match reference build_knn_graph_sklearn
    (knn_graph_optimized.py:25-67): k capped at N-1, self-neighbor stripped
    (row-wise argmin fallback when a duplicate point displaces self), zero
    diagonal, symmetrized per ``sym``.
    """
    z = np.asarray(z, np.float32)
    assert z.ndim == 2, "z must be (N,D)"
    n = z.shape[0]
    if n == 0:
        return (sparse.csr_matrix((0, 0), dtype=np.float32),
                {"distances": np.empty((0, 0), np.float32),
                 "indices": np.empty((0, 0), dtype=int)})
    k_eff = max(0, min(k, n - 1))
    if k_eff == 0:
        return (sparse.csr_matrix((n, n), dtype=np.float32),
                {"distances": np.empty((n, 0), np.float32),
                 "indices": np.empty((n, 0), dtype=int)})

    dists, idxs = knn_search(z, min(k_eff + 1, n), metric=metric,
                              approx=approx, mesh=mesh)

    # strip self-matches: normally the first column; with exact duplicates a
    # twin may rank first, so fall back to dropping the row-wise argmin.
    if (idxs[:, 0] == np.arange(n)).all():
        dists, idxs = dists[:, 1:], idxs[:, 1:]
    else:
        argmin = np.argmin(dists, axis=1)
        keep = np.ones_like(dists, dtype=bool)
        keep[np.arange(n), argmin] = False
        dists = dists[keep].reshape(n, -1)
        idxs = idxs[keep].reshape(n, -1)

    W = _assemble(dists, idxs, n, mode, sym)
    return W, {"distances": dists.astype(np.float32, copy=False), "indices": idxs}


def build_knn_graph_auto(
    z: np.ndarray,
    k: int = 10,
    metric: str = "euclidean",
    mode: str = "distance",
    sym: str = "mutual",
    force_method: Optional[str] = None,
    size_threshold: int = 50_000,
    mesh=None,
) -> Tuple[sparse.csr_matrix, Dict[str, np.ndarray]]:
    """Reference-compatible entry point (knn_graph_optimized.py:129-170).

    There is no backend switch on TPU — one tiled kernel covers all N —
    but the signature (force_method/size_threshold) is preserved so callers
    and configs port unchanged. ``force_method="host"`` selects a numpy
    fallback (used for oracle testing on machines without accelerators).
    """
    if force_method == "host":
        return _build_knn_graph_host(z, k, metric, mode, sym)
    return build_knn_graph(z, k=k, metric=metric, mode=mode, sym=sym,
                           approx=(force_method == "approx"), mesh=mesh)


def _build_knn_graph_host(z, k, metric, mode, sym):
    """Blocked numpy exact kNN (oracle / no-accelerator fallback)."""
    z = np.asarray(z, np.float32)
    n = z.shape[0]
    k_eff = max(0, min(k, n - 1))
    if n == 0 or k_eff == 0:
        return build_knn_graph(z, k, metric, mode, sym)
    if metric == "cosine":
        zn = z / (np.linalg.norm(z, axis=1, keepdims=True) + 1e-8)
    else:
        zn = z
    sq = (zn * zn).sum(1)
    kq = min(k_eff + 1, n)
    dists = np.empty((n, kq), np.float32)
    idxs = np.empty((n, kq), np.int64)
    block = max(1, 2_000_000 // max(n, 1))
    for s in range(0, n, block):
        e = min(s + block, n)
        dots = zn[s:e] @ zn.T
        d = (1.0 - dots) if metric == "cosine" else (sq[s:e, None] - 2 * dots + sq[None, :])
        part = np.argpartition(d, kq - 1, axis=1)[:, :kq]
        pd = np.take_along_axis(d, part, axis=1)
        order = np.argsort(pd, axis=1, kind="stable")
        idxs[s:e] = np.take_along_axis(part, order, axis=1)
        dists[s:e] = np.take_along_axis(pd, order, axis=1)
    if metric == "euclidean":
        dists = np.sqrt(np.maximum(dists, 0.0))
    if (idxs[:, 0] == np.arange(n)).all():
        dists, idxs = dists[:, 1:], idxs[:, 1:]
    else:
        argmin = np.argmin(dists, axis=1)
        keep = np.ones_like(dists, dtype=bool)
        keep[np.arange(n), argmin] = False
        dists = dists[keep].reshape(n, -1)
        idxs = idxs[keep].reshape(n, -1)
    W = _assemble(dists, idxs, n, mode, sym)
    return W, {"distances": dists, "indices": idxs}


def bfs_node_order(W: sparse.csr_matrix) -> np.ndarray:
    """BFS relabeling permutation: ``perm[new_id] = old_id``.

    Relabeling nodes in BFS order makes shortest paths roughly monotone in
    node id, so the device relaxation's alternating forward/backward
    Gauss-Seidel sweeps (ops.shortest_paths) converge in a handful of
    passes instead of O(diameter). Covers all components (BFS restarts at
    the lowest unvisited node).

    Traversal follows stored edges only (``directed=True``): the builders
    always hand in symmetrized graphs, where this is identical to the
    undirected traversal but skips scipy's transpose pass (measured
    11.1s -> 0.8s at 960k nodes / 30M edges on this host). For an
    asymmetric input the restart loop still yields a complete, valid
    permutation — only sweep convergence, never correctness, depends on
    the order.
    """
    from scipy.sparse.csgraph import breadth_first_order

    n = W.shape[0]
    W = W.tocsr()
    visited = np.zeros(n, dtype=bool)
    order = np.empty(n, dtype=np.int64)
    pos = 0
    for start in range(n):
        if visited[start]:
            continue
        nodes = breadth_first_order(W, start, directed=True,
                                    return_predecessors=False)
        nodes = nodes[~visited[nodes]]
        visited[nodes] = True
        order[pos:pos + len(nodes)] = nodes
        pos += len(nodes)
        if pos == n:
            break
    return order


def largest_connected_component(W: sparse.csr_matrix) -> np.ndarray:
    """Boolean mask of nodes in the largest component (reference
    knn_graph_optimized.py:173-181).

    Large graphs route to the native union-find (8x scipy at 983k/20M on
    this 1-core host); labels differ (native uses component-root ids) but
    the mask is label-representation independent."""
    from .. import native

    if W.nnz >= _native_assemble_min() and native.available():
        n_comp, labels = native.connected_components(W.tocsr())
    else:
        n_comp, labels = connected_components(W, directed=False)
    if n_comp <= 1:
        return np.ones(W.shape[0], dtype=bool)
    counts = np.bincount(labels)
    return labels == np.argmax(counts)


def symmetric_csr_from_edges(rows: np.ndarray, cols: np.ndarray,
                             w: np.ndarray, n: int) -> sparse.csr_matrix:
    """Symmetric CSR from a unique undirected edge list (``rows < cols``,
    no duplicates) — the codebook builders' re-weighted-graph assembly.
    Scipy-identical to ``csr_matrix((w, (rows, cols)), (n, n)); W + W.T``
    for such inputs; large lists route to the native one-pass assembler
    (~4x the scipy chain at 10M edges on this 1-core host)."""
    from .. import native

    if 2 * rows.shape[0] >= _native_assemble_min() and native.available():
        # the native one-pass assembler ASSUMES rows < cols and no
        # duplicates (the scipy chain would instead sum duplicates and
        # tolerate self-loops) — fail loudly on precondition violations
        # instead of returning a subtly different CSR at scale
        if rows.shape[0] and not bool(np.all(rows < cols)):
            raise ValueError(
                "symmetric_csr_from_edges: edge list must satisfy "
                "rows < cols (upper-triangular, self-loop-free) for the "
                "native assembly path")
        if os.environ.get("VQVAE_TPU_VALIDATE_EDGES") == "1":
            keys = rows.astype(np.int64) * n + cols
            if np.unique(keys).shape[0] != keys.shape[0]:
                raise ValueError(
                    "symmetric_csr_from_edges: duplicate edges in input "
                    "(native assembly requires a unique edge list)")
        return native.edges_assemble(rows, cols, w, n)
    W = sparse.csr_matrix((w, (rows, cols)), shape=(n, n))
    return W + W.T


def analyze_graph_connectivity(W: sparse.csr_matrix) -> Dict:
    """Connectivity stats (reference knn_graph_optimized.py:184-220)."""
    n = W.shape[0]
    n_components, labels = connected_components(W, directed=False)
    if n_components > 1:
        sizes = np.bincount(labels)
        largest = int(sizes.max())
    else:
        largest = n
    degrees = np.asarray(W.sum(axis=1)).ravel()
    return {
        "n_nodes": n,
        "n_edges": int(W.nnz),
        "n_components": int(n_components),
        "largest_component_size": largest,
        "connectivity_ratio": largest / max(n, 1),
        "avg_degree": float(degrees.mean()) if n else 0.0,
        "min_degree": float(degrees.min()) if n else 0.0,
        "max_degree": float(degrees.max()) if n else 0.0,
    }
