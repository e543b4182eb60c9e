#!/usr/bin/env python
"""Attribute the HOST-side prep cost inside fit_kmedoids at bench shape.

The bench's k-medoids stage (t_kmed) contains, besides the device solver
passes (ELL_STATS times those), one-time host work: BFS node reordering,
the permuted-CSR rebuild, GraphHandle/BucketedGraph construction (bucket
assembly over all stored edges), and per-round kpp host logic. All of it
depends only on the GRAPH SHAPE, not on edge semantics, so it is
measurable on this host with a same-shape random graph — no TPU needed.

Usage: python tools/bench_kmedoids_prep.py [--nodes 983040] [--k 10]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np
from scipy import sparse

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_random_graph(n: int, k: int, seed: int = 0) -> sparse.csr_matrix:
    """Symmetric CSR with ~n*k undirected edges (union-kNN-like shape).

    Mix of short-range (id-local, mimics BFS-friendly kNN locality) and
    long-range edges so BFS cost is realistic.
    """
    rng = np.random.default_rng(seed)
    e = n * k
    rows = rng.integers(0, n - 1, size=e, dtype=np.int64)
    span = np.where(rng.random(e) < 0.8,
                    rng.integers(1, 50, size=e),
                    rng.integers(1, n, size=e))
    cols = (rows + span) % n  # wrap, don't clamp: clamping piles O(n)
    # edges onto node n-1, creating a degenerate giant-degree ELL bucket
    # no kNN graph has (union-kNN degree is bounded by ~2k + ties)
    rows, cols = np.minimum(rows, cols), np.maximum(rows, cols)
    keep = rows < cols
    rows, cols = rows[keep], cols[keep]
    w = rng.random(rows.size).astype(np.float32) + 0.1
    W = sparse.csr_matrix((w, (rows, cols)), shape=(n, n))
    W = W + W.T
    return W.tocsr()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=983040)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from vqvae_tpu.ops.ell import BucketedGraph
    from vqvae_tpu.ops.graph import bfs_node_order

    t = {}
    t0 = time.perf_counter()
    W = make_random_graph(args.nodes, args.k)
    t["make_graph"] = time.perf_counter() - t0
    nnz = W.nnz

    t0 = time.perf_counter()
    perm = bfs_node_order(W)
    t["bfs_node_order"] = time.perf_counter() - t0

    # current path in fit_kmedoids: scipy double fancy-index permutation
    t0 = time.perf_counter()
    Wp = W.tocsr()[perm][:, perm]
    t["csr_perm_scipy_double_index"] = time.perf_counter() - t0

    # candidate replacement: permute in COO and rebuild once
    t0 = time.perf_counter()
    inv = np.empty(args.nodes, np.int64)
    inv[perm] = np.arange(args.nodes)
    coo = W.tocoo()
    Wp2 = sparse.csr_matrix(
        (coo.data, (inv[coo.row], inv[coo.col])), shape=W.shape)
    t["csr_perm_coo_rebuild"] = time.perf_counter() - t0
    assert Wp2.nnz == Wp.nnz
    # spot-check equality on a few rows
    for r in (0, args.nodes // 2, args.nodes - 1):
        assert np.allclose(Wp[r].toarray(), Wp2[r].toarray())

    t0 = time.perf_counter()
    BucketedGraph.from_csr(Wp, assume_symmetric=True)
    t["bucketed_from_csr_sym"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    BucketedGraph.from_csr(Wp, assume_symmetric=False)
    t["bucketed_from_csr_dedup"] = time.perf_counter() - t0

    out = {"nodes": args.nodes, "nnz": int(nnz),
           "seconds": {k2: round(v, 3) for k2, v in t.items()}}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
