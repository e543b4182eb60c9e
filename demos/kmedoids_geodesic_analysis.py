#!/usr/bin/env python
"""K-sweep elbow analysis with clustering-quality metrics.

Parity with reference demos/kmedoids_geodesic_analysis.py: sweep codebook
sizes, record quantization error (elbow curve) plus purity / NMI / ARI
against the dataset labels and codebook perplexity.
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
from vqvae_tpu.utils.latents import load_latents  # noqa: E402


def purity(labels_true, labels_pred) -> float:
    total = 0
    for c in np.unique(labels_pred):
        members = labels_true[labels_pred == c]
        if members.size:
            total += np.bincount(members).max()
    return total / max(len(labels_true), 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("experiment_dir", type=str)
    ap.add_argument("--Ks", type=int, nargs="+", default=[16, 32, 64, 128])
    ap.add_argument("--k_graph", type=int, default=10)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--max_points", type=int, default=10000)
    args = ap.parse_args()

    from sklearn.metrics import adjusted_rand_score, normalized_mutual_info_score

    exp = Path(args.experiment_dir)
    lat = load_latents(next(exp.rglob("latents_train")))
    z, y = lat["z"], lat["y"]
    if z.ndim == 4:  # per-image analysis: pool the grid
        z = z.mean(axis=(1, 2))
    z = z[:args.max_points].astype(np.float32)
    y = y[:args.max_points]

    W, _ = build_knn_graph(z, k=args.k_graph, sym="union")
    mask = largest_connected_component(W)
    W_lcc = W[mask][:, mask]
    y_lcc = y[mask]

    rows = []
    for K in args.Ks:
        medoids, assign, qe = fit_kmedoids(W_lcc, K=K, init="kpp_parallel",
                                           seed=args.seed)
        hist = np.bincount(assign, minlength=K).astype(np.float64)
        p = hist / max(hist.sum(), 1.0)
        ppl = float(np.exp(-(p * np.log(p + 1e-12)).sum()))
        rows.append({
            "K": K, "qe": qe,
            "purity": purity(y_lcc, assign),
            "nmi": float(normalized_mutual_info_score(y_lcc, assign)),
            "ari": float(adjusted_rand_score(y_lcc, assign)),
            "perplexity": ppl,
        })
        print(f"K={K}: qe={qe:.1f} purity={rows[-1]['purity']:.3f} "
              f"nmi={rows[-1]['nmi']:.3f} ari={rows[-1]['ari']:.3f} "
              f"ppl={ppl:.1f}")

    out = exp / "demo_kmedoids_analysis.json"
    with open(out, "w") as f:
        json.dump(rows, f, indent=2)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(9, 4))
    ks = [r["K"] for r in rows]
    axes[0].plot(ks, [r["qe"] for r in rows], "o-")
    axes[0].set_xlabel("K")
    axes[0].set_ylabel("quantization error")
    axes[0].set_title("elbow")
    axes[1].plot(ks, [r["purity"] for r in rows], "o-", label="purity")
    axes[1].plot(ks, [r["nmi"] for r in rows], "s-", label="NMI")
    axes[1].plot(ks, [r["ari"] for r in rows], "^-", label="ARI")
    axes[1].legend()
    axes[1].set_xlabel("K")
    fig.tight_layout()
    fig.savefig(exp / "demo_kmedoids_analysis.png", dpi=120)
    print(f"[demo] saved {out} and the elbow plot")


if __name__ == "__main__":
    main()
