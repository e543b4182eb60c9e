#!/usr/bin/env python
"""Euclidean K-means vs geodesic K-medoids codebook comparison.

Parity with reference demos/codebook_comparison.py: build both codebooks
from an experiment's latents, compare reconstruction MSE, perplexity and
quantization error, and plot the comparison. The Euclidean side uses the
jitted Lloyd K-means (ops.kmeans_euclidean) instead of sklearn.
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
import _common  # noqa: F401,E402

import numpy as np  # noqa: E402

from vqvae_tpu.ops import build_knn_graph, fit_kmedoids, largest_connected_component  # noqa: E402
from vqvae_tpu.ops.kmeans_euclidean import fit_kmeans  # noqa: E402
from vqvae_tpu.utils.latents import load_latents  # noqa: E402


def perplexity(labels: np.ndarray, K: int) -> float:
    hist = np.bincount(labels[labels >= 0], minlength=K).astype(np.float64)
    p = hist / max(hist.sum(), 1.0)
    return float(np.exp(-(p * np.log(p + 1e-12)).sum()))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("experiment_dir", type=str)
    ap.add_argument("--K", type=int, default=64)
    ap.add_argument("--k_graph", type=int, default=10)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--max_points", type=int, default=20000)
    args = ap.parse_args()

    exp = Path(args.experiment_dir)
    lat_dirs = list(exp.rglob("latents_train"))
    if not lat_dirs:
        raise FileNotFoundError(f"no latents_train under {exp}")
    lat = load_latents(lat_dirs[0])
    z = lat["z"]
    if z.ndim == 4:  # spatial: flatten grid cells to nodes
        z = z.reshape(-1, z.shape[-1])
    z = z[:args.max_points].astype(np.float32)
    print(f"[demo] latents: {z.shape}")

    # Euclidean K-means codebook
    centers, eu_labels, inertia = fit_kmeans(z, args.K, seed=args.seed)
    eu_mse = float(np.mean(np.sum((z - centers[eu_labels]) ** 2, axis=1)))
    print(f"[euclidean] inertia={inertia:.1f} recon_mse={eu_mse:.4f} "
          f"perplexity={perplexity(eu_labels, args.K):.1f}")

    # geodesic K-medoids codebook
    W, _ = build_knn_graph(z, k=args.k_graph, sym="union")
    mask = largest_connected_component(W)
    W_lcc = W[mask][:, mask]
    medoids, geo_labels_lcc, qe = fit_kmedoids(W_lcc, K=args.K,
                                               init="kpp_parallel",
                                               seed=args.seed)
    geo_labels = np.full(len(z), -1, np.int64)
    geo_labels[mask] = geo_labels_lcc
    z_lcc = z[mask]
    geo_mse = float(np.mean(np.sum(
        (z_lcc - z_lcc[medoids][geo_labels_lcc]) ** 2, axis=1)))
    print(f"[geodesic] qe={qe:.1f} recon_mse={geo_mse:.4f} "
          f"perplexity={perplexity(geo_labels, args.K):.1f}")

    results = {
        "K": args.K, "k_graph": args.k_graph, "n_points": int(len(z)),
        "euclidean": {"inertia": inertia, "recon_mse": eu_mse,
                      "perplexity": perplexity(eu_labels, args.K)},
        "geodesic": {"qe": qe, "recon_mse": geo_mse,
                     "perplexity": perplexity(geo_labels, args.K),
                     "lcc_nodes": int(mask.sum())},
    }
    out = exp / "demo_codebook_comparison.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"[demo] saved {out}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(9, 4))
    axes[0].bar(["euclidean", "geodesic"], [eu_mse, geo_mse])
    axes[0].set_title("latent recon MSE")
    axes[1].bar(["euclidean", "geodesic"],
                [perplexity(eu_labels, args.K), perplexity(geo_labels, args.K)])
    axes[1].set_title("perplexity")
    fig.tight_layout()
    fig.savefig(exp / "demo_codebook_comparison.png", dpi=120)
    print(f"[demo] saved {exp / 'demo_codebook_comparison.png'}")


if __name__ == "__main__":
    main()
