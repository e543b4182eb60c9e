#!/usr/bin/env python
"""A/B the ELL bucket cap ladder (VQVAE_TPU_ELL_CAPGROW) at bench shape.

pow2 caps (grow=2) pad the k=10 union graph to ~1.73x nnz slots at 196k
(incl. row-chunk padding); grow=1.5 lands ~1.37x with one extra bucket.
The sweep's dominant traffic is the K-wide distance gather per SLOT, so
fewer slots should cut both solver seconds and the device-graph H2D.
This measures the real trade on hardware: full fit_kmedoids stage time,
solver seconds, sweep count, and the device-graph build/wait split, with
per-arm warmups (each ladder is a fresh set of bucket shapes = its own
remote compile) and ABBA measurement order to cancel service drift.

Usage: BENCH_NODES=983040 python tools/ab_ell_caps.py
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

    def one(grow: str, tag: str):
        os.environ["VQVAE_TPU_ELL_CAPGROW"] = grow
        e0, k0 = len(ELL_STATS), len(KMED_STATS)
        t0 = time.perf_counter()
        medoids, assign, qe = fit_kmedoids(W_lcc, K=K, init="kpp_parallel",
                                           seed=42, mesh=mesh,
                                           assume_symmetric=True)
        t = time.perf_counter() - t0
        ell = ELL_STATS[e0:]
        km = KMED_STATS[k0:][-1]
        rec = {"tag": tag, "capgrow": grow, "kmed_seconds": round(t, 2),
               "sweeps": sum(e["iters"] for e in ell),
               "solver_s": round(sum(e["seconds"] for e in ell), 2),
               "solver_gbps": round(sum(e["bytes"] for e in ell)
                                    / max(sum(e["seconds"] for e in ell),
                                          1e-9) / 1e9, 1),
               "device_graph_s": round(km.get("device_graph_seconds", 0.0), 2),
               "dg_build_s": round(km.get("device_graph_build_seconds", 0.0),
                                   2),
               "dg_wait_s": round(km.get("device_graph_wait_seconds", 0.0), 2),
               "pass_s": round(sum(km.get("pass_seconds", [])), 2),
               "qe": round(float(qe), 2)}
        print("[ab]", json.dumps(rec), flush=True)
        return rec

    recs = []
    # per-arm warmups: each ladder's bucket shapes are a fresh remote compile
    one("2", "warmup-pow2")
    one("1.5", "warmup-x15")
    for grow, tag in (("2", "A1"), ("1.5", "B1"), ("1.5", "B2"), ("2", "A2")):
        recs.append(one(grow, tag))
    out = {"nodes": n_nodes, "k": k, "K": K, "runs": recs}
    path = REPO / "docs/runs/ell-caps-ab-r5.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"[ab] wrote {path}", flush=True)


if __name__ == "__main__":
    main()
