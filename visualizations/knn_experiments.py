#!/usr/bin/env python
"""Geodesic-distance-vs-k analysis plots (reference
visualizations/knn_experiments.py): how the kNN k parameter changes
connectivity and geodesic distance distributions on an experiment's (or
synthetic) latents."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
import _common  # noqa: F401,E402

import numpy as np  # noqa: E402

from vqvae_tpu.ops import build_knn_graph, analyze_graph_connectivity  # noqa: E402
from vqvae_tpu.ops.backend import multi_source_distances  # noqa: E402
from plot_utils import apply_style, save_fig  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--latents", type=str, default=None,
                    help="latents dir/npz; synthetic gaussian if omitted")
    ap.add_argument("--ks", type=int, nargs="+", default=[5, 10, 20, 50])
    ap.add_argument("--n", type=int, default=5000)
    ap.add_argument("--out", type=str, default="demo_outputs/knn_experiments.png")
    args = ap.parse_args()

    if args.latents:
        from vqvae_tpu.utils.latents import load_latents

        z = load_latents(args.latents)["z"]
        if z.ndim == 4:
            z = z.reshape(-1, z.shape[-1])
        z = z[:args.n].astype(np.float32)
    else:
        z = np.random.default_rng(0).normal(size=(args.n, 16)).astype(np.float32)

    apply_style()
    import matplotlib.pyplot as plt

    sources = np.arange(8, dtype=np.int64)
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    ratios, mean_ds = [], []
    for k in args.ks:
        W, _ = build_knn_graph(z, k=k, sym="union")
        stats = analyze_graph_connectivity(W)
        D = multi_source_distances(W, sources)
        finite = D[np.isfinite(D)]
        ratios.append(stats["connectivity_ratio"])
        mean_ds.append(finite.mean() if finite.size else np.nan)
        axes[1].hist(finite, bins=50, alpha=0.5, label=f"k={k}", density=True)
        print(f"k={k}: components={stats['n_components']} "
              f"lcc={stats['connectivity_ratio']:.2%} "
              f"mean geodesic={mean_ds[-1]:.3f}")
    axes[0].plot(args.ks, ratios, "o-", label="LCC fraction")
    axes[0].plot(args.ks, np.asarray(mean_ds) / max(mean_ds), "s-",
                 label="mean geodesic (norm.)")
    axes[0].set_xlabel("k")
    axes[0].legend()
    axes[1].set_xlabel("geodesic distance")
    axes[1].legend()
    save_fig(fig, args.out)
    print(f"[viz] saved {args.out}")


if __name__ == "__main__":
    main()
