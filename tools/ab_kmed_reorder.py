#!/usr/bin/env python
"""A/B the BFS node-reorder inside fit_kmedoids at bench shape, one process.

detail.kmed_split showed reorder_s ~5.1 s of host time at 983k/K=512.
Round 4's CPU A/B found the COLD sweep count order-neutral but kept BFS
for its warm-start benefit; this measures the actual production trade on
hardware: total k-medoids stage seconds and sweep counts with reorder
off/on, ABBA order to cancel service drift.

Usage: BENCH_NODES=983040 python tools/ab_kmed_reorder.py
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ["VQVAE_TPU_ELL_STATS"] = "1"
os.environ["VQVAE_TPU_KMED_STATS"] = "1"

import numpy as np  # noqa: E402


def main():
    n_nodes = int(os.environ.get("BENCH_NODES", 983040))
    k = int(os.environ.get("BENCH_KNN", 10))
    K = int(os.environ.get("BENCH_CODES", 512))

    import jax  # noqa: F401

    from bench import make_latents
    from vqvae_tpu.ops import (build_knn_graph, edge_lengths_riemannian_auto,
                               fit_kmedoids, largest_connected_component,
                               symmetric_csr_from_edges)
    from vqvae_tpu.ops.ell import ELL_STATS
    from vqvae_tpu.ops.kmedoids import KMED_STATS
    from vqvae_tpu.models import VAE
    from vqvae_tpu.ops.riemannian import make_decoder_image_fn
    from vqvae_tpu.parallel import get_mesh, run_on_cpu

    mesh = get_mesh()
    z = make_latents(n_nodes, dim=16, seed=0)
    model = VAE(in_channels=1, latent_dim=16, topology="spatial",
                output_image_size=28, norm_type="batch", recon_loss="mse",
                enc_channels=(64, 128, 256), dec_channels=(256, 128, 64))
    variables = run_on_cpu(lambda r, x: model.init({"params": r}, x),
                           jax.random.key(0),
                           np.zeros((1, 28, 28, 1), np.float32))
    decode_fn = make_decoder_image_fn(model, variables, "spatial")

    print(f"[ab] building graph ({n_nodes} nodes, k={k})...", flush=True)
    W, _ = build_knn_graph(z, k=k, metric="euclidean", mode="connectivity",
                           sym="union", approx=True, mesh=mesh)
    rows, cols = W.nonzero()
    keep = rows < cols
    rows, cols = rows[keep], cols[keep]
    lengths = edge_lengths_riemannian_auto(decode_fn, z, rows, cols,
                                           batch_size=4096, mesh=mesh)
    W_geo = symmetric_csr_from_edges(rows, cols,
                                     np.asarray(lengths, np.float32),
                                     W.shape[0])
    mask = largest_connected_component(W_geo)
    W_lcc = W_geo[mask][:, mask] if mask.sum() < W.shape[0] else W_geo

    def one(reorder: bool, tag: str):
        os.environ["VQVAE_TPU_KMED_REORDER"] = "1" if reorder else "0"
        e0, k0 = len(ELL_STATS), len(KMED_STATS)
        t0 = time.perf_counter()
        medoids, assign, qe = fit_kmedoids(W_lcc, K=K, init="kpp_parallel",
                                           seed=42, mesh=mesh,
                                           assume_symmetric=True)
        t = time.perf_counter() - t0
        ell = ELL_STATS[e0:]
        km = KMED_STATS[k0:][-1]
        rec = {"tag": tag, "reorder": reorder, "kmed_seconds": round(t, 2),
               "sweeps": sum(e["iters"] for e in ell),
               "solver_s": round(sum(e["seconds"] for e in ell), 2),
               "reorder_s": round(km.get("reorder_seconds", 0.0), 2),
               "device_graph_s": round(km.get("device_graph_seconds", 0.0), 2),
               "pass_s": round(sum(km.get("pass_seconds", [])), 2),
               "sample_s": round(km.get("sample_seconds", 0.0), 2),
               "qe": round(float(qe), 2)}
        print("[ab]", json.dumps(rec), flush=True)
        return rec

    recs = []
    # warm-up (compiles; reorder on = production default shapes)
    one(True, "warmup")
    for reorder, tag in ((False, "A1"), (True, "B1"),
                         (True, "B2"), (False, "A2")):
        recs.append(one(reorder, tag))
    out = {"nodes": n_nodes, "k": k, "K": K, "runs": recs}
    path = REPO / "docs/runs/kmed-reorder-ab-r5.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"[ab] wrote {path}", flush=True)


if __name__ == "__main__":
    main()
