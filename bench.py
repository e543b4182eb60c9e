#!/usr/bin/env python
"""Headline benchmark: geodesic codebook build wall-clock.

Measures the reference pipeline's dominant cost (SURVEY.md §3.3 hot loops:
exact kNN graph, k-means++ shortest-path chains, multi-source assignment,
plus the Riemannian JVP re-weighting) on deterministic synthetic spatial
latents, and compares against the reference's own algorithm/stack —
sklearn NearestNeighbors + scipy.sparse.csgraph.dijkstra with the
*sequential* K-center k-means++ loop (reference src/geo/kmeans_optimized
.py:14-106) — run on the same data on the host CPU.

Prints exactly ONE JSON line to stdout:
  {"metric": "geodesic_codebook_build_seconds", "value": <ours>,
   "unit": "s", "vs_baseline": <baseline_seconds / ours_seconds>}

Scale knobs (env):
  BENCH_NODES    total graph nodes          (default 49152 = 3072 imgs x 16)
  BENCH_KNN      kNN k                      (default 10)
  BENCH_CODES    codebook size K            (default 256)
  BENCH_BASELINE run the host baseline 0/1  (default 1)
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def make_latents(n_nodes: int, dim: int = 16, seed: int = 0) -> np.ndarray:
    """Clustered gaussian latents (10 lobes) — mimics trained-VAE structure
    so the kNN graph has realistic connectivity."""
    rng = np.random.default_rng(seed)
    # lobes overlap (center sigma ~ noise sigma) so the kNN graph stays one
    # component — matching real VAE latents, where the LCC covers ~all nodes
    # (reference docs/results/fashion_mnist_results.md:51-53)
    centers = rng.normal(0, 1.2, size=(10, dim)).astype(np.float32)
    labels = rng.integers(0, 10, size=n_nodes)
    z = centers[labels] + rng.normal(0, 1.0, size=(n_nodes, dim)).astype(np.float32)
    return z.astype(np.float32)


def run_ours(z: np.ndarray, k: int, K: int, decode_fn) -> float:
    from scipy import sparse

    from vqvae_tpu.ops import (build_knn_graph, edge_lengths_riemannian,
                               fit_kmedoids, largest_connected_component)

    t0 = time.perf_counter()
    W, _ = build_knn_graph(z, k=k, metric="euclidean", mode="connectivity",
                           sym="union",
                           approx=os.environ.get("BENCH_KNN_APPROX") == "1")
    t_knn = time.perf_counter() - t0
    rows, cols = W.nonzero()
    keep = rows < cols
    rows, cols = rows[keep], cols[keep]
    t1 = time.perf_counter()
    lengths = edge_lengths_riemannian(decode_fn, z[rows], z[cols],
                                      batch_size=4096)
    t_riem = time.perf_counter() - t1
    W_geo = sparse.csr_matrix((lengths, (rows, cols)), shape=W.shape)
    W_geo = W_geo + W_geo.T
    mask = largest_connected_component(W_geo)
    W_lcc = W_geo[mask][:, mask] if mask.sum() < W.shape[0] else W_geo
    t2 = time.perf_counter()
    medoids, assign, qe = fit_kmedoids(W_lcc, K=K, init="kpp_parallel", seed=42)
    t_kmed = time.perf_counter() - t2
    total = time.perf_counter() - t0
    log(f"[ours] knn={t_knn:.1f}s riemannian={t_riem:.1f}s "
        f"kmedoids={t_kmed:.1f}s total={total:.1f}s "
        f"(K={len(medoids)}, qe={qe:.1f}, lcc={int(mask.sum())})")
    return total


def run_baseline(z: np.ndarray, k: int, K: int, decode_fn) -> float:
    """The reference's algorithm on its own stack (sklearn + scipy), with
    the JVP re-weighting done through the same jitted decode_fn (the
    reference's torch JVP hot loop has no host-only equivalent here; this
    UNDERSTATES the baseline's true cost, so vs_baseline is conservative)."""
    from scipy import sparse
    from scipy.sparse.csgraph import dijkstra
    from sklearn.neighbors import NearestNeighbors

    from vqvae_tpu.ops import edge_lengths_riemannian

    t0 = time.perf_counter()
    n = z.shape[0]
    nn = NearestNeighbors(n_neighbors=k + 1).fit(z)
    dists, idxs = nn.kneighbors(z)
    dists, idxs = dists[:, 1:], idxs[:, 1:]
    data = np.ones(idxs.size, np.float32)
    rows = np.repeat(np.arange(n), k)
    W = sparse.csr_matrix((data, (rows, idxs.ravel())), shape=(n, n))
    W = W.maximum(W.T)
    W.setdiag(0.0)
    W.eliminate_zeros()
    t_knn = time.perf_counter() - t0

    r, c = W.nonzero()
    keep = r < c
    r, c = r[keep], c[keep]
    t1 = time.perf_counter()
    lengths = edge_lengths_riemannian(decode_fn, z[r], z[c], batch_size=512)
    t_riem = time.perf_counter() - t1
    W_geo = sparse.csr_matrix((lengths, (r, c)), shape=W.shape)
    W_geo = W_geo + W_geo.T

    from scipy.sparse.csgraph import connected_components

    ncomp, labels = connected_components(W_geo, directed=False)
    if ncomp > 1:
        mask = labels == np.bincount(labels).argmax()
        W_lcc = W_geo[mask][:, mask].tocsr()
    else:
        W_lcc = W_geo.tocsr()

    # reference kpp: K-1 sequential single-source Dijkstras
    t2 = time.perf_counter()
    rng = np.random.RandomState(42)
    n_lcc = W_lcc.shape[0]
    centers = [int(rng.randint(0, n_lcc))]
    d_min = np.full(n_lcc, np.inf, np.float32)
    for i in range(1, K):
        d = dijkstra(W_lcc, directed=False, indices=[centers[-1]])[0]
        d_min = np.minimum(d_min, d.astype(np.float32))
        finite = np.isfinite(d_min)
        safe = np.where(finite, d_min, (d_min[finite].max() * 2.0) if finite.any() else 1.0)
        probs = safe.astype(np.float64) ** 2
        probs[centers] = 0.0
        s = probs.sum()
        if s > 0:
            centers.append(int(rng.choice(n_lcc, p=probs / s)))
        else:
            centers.append(int(rng.choice(np.setdiff1d(np.arange(n_lcc), centers))))
        if i % 64 == 0:
            log(f"[baseline] kpp {i}/{K} ({time.perf_counter() - t2:.0f}s)")
    # assignment + QE: two multi-source passes like the reference
    D = dijkstra(W_lcc, directed=False, indices=np.asarray(centers))
    assign = D.argmin(axis=0)
    D2 = dijkstra(W_lcc, directed=False, indices=np.asarray(centers))
    d_assigned = D2[assign, np.arange(n_lcc)]
    qe = float(np.nansum(np.where(np.isfinite(d_assigned), d_assigned, 0.0) ** 2))
    t_kmed = time.perf_counter() - t2
    total = time.perf_counter() - t0
    log(f"[baseline] knn={t_knn:.1f}s riemannian={t_riem:.1f}s "
        f"kmedoids={t_kmed:.1f}s total={total:.1f}s (qe={qe:.1f})")
    return total


def main() -> None:
    n_nodes = int(os.environ.get("BENCH_NODES", 49152))
    k = int(os.environ.get("BENCH_KNN", 10))
    K = int(os.environ.get("BENCH_CODES", 256))
    run_base = os.environ.get("BENCH_BASELINE", "1") == "1"

    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.cache/vqvae_tpu_xla"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from vqvae_tpu.models import VAE
    from vqvae_tpu.ops.riemannian import make_decoder_image_fn

    log(f"[bench] devices={jax.devices()} nodes={n_nodes} k={k} K={K}")
    z = make_latents(n_nodes, dim=16, seed=0)

    model = VAE(in_channels=1, latent_dim=16, topology="spatial",
                output_image_size=28, norm_type="batch", recon_loss="mse",
                enc_channels=(64, 128, 256), dec_channels=(256, 128, 64))
    variables = model.init({"params": jax.random.key(0)},
                           np.zeros((1, 28, 28, 1), np.float32))
    decode_fn = make_decoder_image_fn(model, variables, "spatial")

    # warm-up at the MEASUREMENT shapes: XLA programs are shape-specialized
    # and this environment's compiles are remote (minutes, uncacheable), so
    # a small-slice warm-up would leave the real shapes uncompiled and
    # pollute the measured run with compile latency.
    log("[bench] warm-up compile (full shapes)...")
    run_ours(z, k=k, K=K, decode_fn=decode_fn)

    # min-of-2 on both sides: the shared host makes single baseline runs
    # noisy (observed 22-134s for the same work), and min is the fairest
    # (fastest) reading for each side.
    ours = min(run_ours(z, k=k, K=K, decode_fn=decode_fn)
               for _ in range(2))
    vs = None
    if run_base:
        baseline = min(run_baseline(z, k=k, K=K, decode_fn=decode_fn)
                       for _ in range(2))
        vs = baseline / ours

    print(json.dumps({
        "metric": "geodesic_codebook_build_seconds",
        "value": round(ours, 3),
        "unit": "s",
        "vs_baseline": round(vs, 3) if vs is not None else None,
    }), flush=True)


if __name__ == "__main__":
    main()
