#!/usr/bin/env python
"""Clickable kNN/geodesic explorer with per-k caching (reference
visualizations/interactive_knn_viz.py). With a display, click any point to
recolor by geodesic distance from it; headless, renders a static panel.
"""
import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
import _common  # noqa: F401,E402

import numpy as np  # noqa: E402

from vqvae_tpu.ops import build_knn_graph  # noqa: E402
from vqvae_tpu.ops.backend import multi_source_distances  # noqa: E402


class Explorer:
    """Caches one graph per k; recomputes distances per clicked source."""

    def __init__(self, z2d: np.ndarray, k: int):
        self.z = z2d
        self._cache = {}
        self.set_k(k)

    def set_k(self, k: int):
        if k not in self._cache:
            self._cache[k], _ = build_knn_graph(self.z, k=k, sym="union")
        self.W = self._cache[k]

    def distances_from(self, idx: int) -> np.ndarray:
        return multi_source_distances(self.W, np.asarray([idx]))[:, 0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=800)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--out", type=str, default="demo_outputs/interactive_knn_viz.png")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    t = rng.uniform(0, 4 * np.pi, args.n)
    z = np.stack([t * np.cos(t), t * np.sin(t)], 1).astype(np.float32)
    z += rng.normal(0, 0.3, z.shape).astype(np.float32)
    explorer = Explorer(z, args.k)

    import matplotlib

    interactive = bool(os.environ.get("DISPLAY"))
    if not interactive:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 5))

    def draw(idx: int):
        ax.clear()
        d = explorer.distances_from(idx)
        finite = np.isfinite(d)
        ax.scatter(z[finite, 0], z[finite, 1], c=d[finite], s=8, cmap="viridis")
        ax.scatter(z[~finite, 0], z[~finite, 1], c="lightgray", s=8)
        ax.scatter(*z[idx], c="red", s=100, marker="*")
        ax.set_title(f"geodesic distances from node {idx} (k={args.k})")
        fig.canvas.draw_idle()

    draw(0)
    if interactive:
        def on_click(event):
            if event.xdata is None:
                return
            p = np.array([event.xdata, event.ydata], np.float32)
            idx = int(np.argmin(((z - p) ** 2).sum(1)))
            draw(idx)

        fig.canvas.mpl_connect("button_press_event", on_click)
        plt.show()
    else:
        out = Path(args.out)
        out.parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(out, dpi=120)
        print(f"[viz] headless: saved {out}")


if __name__ == "__main__":
    main()
