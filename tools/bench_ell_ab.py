#!/usr/bin/env python
"""A/B the ELL relaxation's gather formulation on the real chip.

One process, one graph build (cached), multiple env-keyed sweep variants —
so the shared platform's session-to-session variance cannot confound the
comparison. Each variant re-runs the same K-source pass; ELL_STATS gives
solver-only seconds + effective GB/s.

  python tools/bench_ell_ab.py --nodes 983040 --codes 512 \
      --variants "base:;blk4:VQVAE_TPU_ELL_DEGBLOCK=4,VQVAE_TPU_ELL_CHUNK=4096"
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ["VQVAE_TPU_ELL_STATS"] = "1"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=983040)
    ap.add_argument("--codes", type=int, default=512)
    ap.add_argument("--knn", type=int, default=10)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--graph-cache", default="/tmp/ell_ab_graph.npz")
    ap.add_argument("--variants",
                    default=("base:;"
                             "blk4:VQVAE_TPU_ELL_DEGBLOCK=4,VQVAE_TPU_ELL_CHUNK=4096;"
                             "blk2:VQVAE_TPU_ELL_DEGBLOCK=2,VQVAE_TPU_ELL_CHUNK=8192"))
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from bench import make_latents  # noqa: E402
    from scipy import sparse

    from vqvae_tpu.ops import build_knn_graph
    from vqvae_tpu.ops.ell import (ELL_STATS, BucketedGraph,
                                   multi_source_shortest_paths_ell)
    from vqvae_tpu.ops.graph import bfs_node_order

    print(f"devices={jax.devices()}", file=sys.stderr)
    cache = Path(args.graph_cache)
    if cache.exists():
        W = sparse.load_npz(cache)
    else:
        z = make_latents(args.nodes, dim=16, seed=0)
        W, _ = build_knn_graph(z, k=args.knn, metric="euclidean",
                               mode="distance", sym="union", approx=True)
        sparse.save_npz(cache, W.tocsr())
    perm = bfs_node_order(W)
    W = W.tocsr()[perm][:, perm]
    print(f"[graph] {W.shape[0]} nodes, {W.nnz} directed edges",
          file=sys.stderr)
    rng = np.random.default_rng(0)
    sources = rng.choice(W.shape[0], size=args.codes, replace=False)

    env_keys = ("VQVAE_TPU_ELL_DEGBLOCK", "VQVAE_TPU_ELL_CHUNK",
                "VQVAE_TPU_ELL_MINROWS")
    results = {}
    for spec in args.variants.split(";"):
        name, _, envs = spec.partition(":")
        for k in env_keys:
            os.environ.pop(k, None)
        for kv in filter(None, envs.split(",")):
            k, _, v = kv.partition("=")
            os.environ[k] = v
        t0 = time.perf_counter()
        bg = BucketedGraph.from_csr(W, assume_symmetric=True)
        t_build = time.perf_counter() - t0
        shapes = [tuple(nb.shape) for nb in bg.nbrs if nb.shape[0]]
        runs = []
        for r in range(args.runs + 1):  # run 0 = compile
            s0 = len(ELL_STATS)
            t0 = time.perf_counter()
            d = multi_source_shortest_paths_ell(bg, sources)
            np.asarray(d)  # fence
            dt = time.perf_counter() - t0
            st = ELL_STATS[s0:]
            if r > 0:
                runs.append({"wall_s": round(dt, 2),
                             "solver_s": round(sum(e["seconds"] for e in st), 2),
                             "gbps": round(st[-1]["gbps"], 1) if st else None,
                             "sweeps": sum(e["iters"] for e in st)})
            print(f"[{name}] run{r}: {dt:.1f}s "
                  f"{st[-1] if st else ''}", file=sys.stderr)
        results[name] = {"prep_s": round(t_build, 2), "buckets": shapes,
                         "runs": runs}
    print(json.dumps({"nodes": int(W.shape[0]), "K": args.codes,
                      "results": results}))


if __name__ == "__main__":
    main()
