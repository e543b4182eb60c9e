#!/usr/bin/env python
"""Nodal vs edgewise Riemannian edge-length engines on the real chip.

Same decoder + graph shape as bench.py's north-star run; times each engine
back-to-back in ONE session so the shared platform's day-to-day variance
cannot confound the comparison (round-1/round-2 cross-session numbers
differed 2x on identical code).

Usage:
  python tools/bench_riemannian.py --nodes 983040 --knn 10 --runs 2
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=196608)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--knn", type=int, default=10)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--batches", default=None,
                    help="comma list of batch sizes to sweep (fused engine "
                         "only), e.g. 4096,8192,16384 — one session")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--engines", default="nodal,edgewise",
                    help="comma list of: nodal, edgewise (unfused 2-JVP), "
                         "fused (one concatenated-endpoint JVP), bf16 "
                         "(fused + bf16 decoder compute, f32 norms), "
                         "indexed (fused conv + device-side endpoint "
                         "gathers), mlp (linearized matmul decoder + "
                         "device gathers)")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--graph-cache", default=None,
                    help="npz path caching the kNN graph at this shape "
                         "(skips the kNN build + its compile per process)")
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from bench import make_latents  # noqa: E402

    from vqvae_tpu.models import VAE
    from vqvae_tpu.ops import (build_knn_graph, edge_lengths_riemannian,
                               edge_lengths_riemannian_nodal)
    from vqvae_tpu.ops.riemannian import make_decoder_image_fn

    print(f"devices={jax.devices()}", file=sys.stderr)
    z = make_latents(args.nodes, dim=args.dim, seed=0)
    model = VAE(in_channels=1, latent_dim=args.dim, topology="spatial",
                output_image_size=28, norm_type="batch", recon_loss="mse",
                enc_channels=(64, 128, 256), dec_channels=(256, 128, 64))
    from vqvae_tpu.parallel import run_on_cpu

    variables = run_on_cpu(lambda r, x: model.init({"params": r}, x),
                           jax.random.key(0),
                           np.zeros((1, 28, 28, 1), np.float32))
    decode_fn = make_decoder_image_fn(model, variables, "spatial")

    cache = Path(args.graph_cache) if args.graph_cache else None
    if cache is not None and cache.exists():
        from scipy import sparse

        W = sparse.load_npz(cache)
        assert W.shape[0] == args.nodes, (W.shape, args.nodes)
        print(f"[graph] loaded {cache} nnz={W.nnz}", file=sys.stderr)
    else:
        W, _ = build_knn_graph(z, k=args.knn, metric="euclidean",
                               mode="connectivity", sym="union", approx=True)
        if cache is not None:
            from scipy import sparse

            sparse.save_npz(cache, W.tocsr())
            print(f"[graph] saved {cache}", file=sys.stderr)
    rows, cols = W.nonzero()
    keep = rows < cols
    rows, cols = rows[keep], cols[keep]
    print(f"[graph] {len(rows)} undirected edges", file=sys.stderr)

    bf16_model = VAE(in_channels=1, latent_dim=args.dim, topology="spatial",
                     output_image_size=28, norm_type="batch",
                     recon_loss="mse", enc_channels=(64, 128, 256),
                     dec_channels=(256, 128, 64), dtype=jax.numpy.bfloat16)
    decode_bf16 = make_decoder_image_fn(bf16_model, variables, "spatial")

    mlp_fn = None
    if "mlp" in args.engines:
        from vqvae_tpu.ops import build_mlp_decode_fn

        mlp_fn = build_mlp_decode_fn(model, variables)
        assert mlp_fn is not None

    results = {}
    ref = None
    if args.batches:
        eng0 = args.engines.split(",")[0]

        def run_once(bs):
            if eng0 == "mlp":
                from vqvae_tpu.ops import edge_lengths_riemannian_indexed

                return edge_lengths_riemannian_indexed(
                    mlp_fn, z, rows, cols, batch_size=bs, fused=True)
            if eng0 == "indexed":
                from vqvae_tpu.ops import edge_lengths_riemannian_indexed

                return edge_lengths_riemannian_indexed(
                    decode_fn, z, rows, cols, batch_size=bs, fused=True)
            return edge_lengths_riemannian(
                decode_fn, z[rows], z[cols], batch_size=bs, fused=True)

        for bs in (int(x) for x in args.batches.split(",")):
            times = []
            for r in range(args.runs + 1):
                t0 = time.perf_counter()
                run_once(bs)
                dt = time.perf_counter() - t0
                if r > 0:
                    times.append(dt)
                print(f"[{eng0} bs{bs}] run{r}: {dt:.1f}s", file=sys.stderr)
            results[f"bs{bs}"] = round(min(times), 2)
        print(json.dumps({"nodes": args.nodes, "edges": int(len(rows)),
                          "engine": eng0, "results": results}))
        return
    for engine in args.engines.split(","):
        times = []
        for r in range(args.runs + 1):  # run 0 = compile
            t0 = time.perf_counter()
            if engine == "nodal":
                lengths = edge_lengths_riemannian_nodal(
                    decode_fn, z, rows, cols, batch_size=args.batch)
            elif engine == "fused":
                lengths = edge_lengths_riemannian(
                    decode_fn, z[rows], z[cols], batch_size=args.batch,
                    fused=True)
            elif engine == "bf16":
                lengths = edge_lengths_riemannian(
                    decode_bf16, z[rows], z[cols], batch_size=args.batch,
                    fused=True)
            elif engine == "indexed":
                from vqvae_tpu.ops import edge_lengths_riemannian_indexed

                lengths = edge_lengths_riemannian_indexed(
                    decode_fn, z, rows, cols, batch_size=args.batch,
                    fused=True)
            elif engine == "mlp":
                from vqvae_tpu.ops import edge_lengths_riemannian_indexed

                lengths = edge_lengths_riemannian_indexed(
                    mlp_fn, z, rows, cols, batch_size=args.batch,
                    fused=True)
            else:
                lengths = edge_lengths_riemannian(
                    decode_fn, z[rows], z[cols], batch_size=args.batch,
                    fused=False)
            dt = time.perf_counter() - t0
            if r > 0:
                times.append(dt)
            print(f"[{engine}] run{r}: {dt:.1f}s", file=sys.stderr)
        if ref is None:
            ref = lengths
        else:
            err = float(np.max(np.abs(lengths - ref)
                               / np.maximum(np.abs(ref), 1e-6)))
            print(f"[{engine}] max rel diff vs first engine: {err:.2e}",
                  file=sys.stderr)
            results[f"{engine}_max_rel_diff"] = err
        results[engine] = round(min(times), 2)
    print(json.dumps({"nodes": args.nodes, "edges": int(len(rows)),
                      "batch": args.batch, "results": results}))


if __name__ == "__main__":
    main()
