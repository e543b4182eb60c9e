#!/usr/bin/env python
"""Riemannian re-weighting effect on graph structure.

Parity with reference experiments/geo/run_riemann_experiments.py (results
in reference docs/geo/riemann_graph_effect.md:47-70): build a Euclidean
kNN graph over an experiment's latents, re-weight a stratified edge subset
with Riemannian lengths, and report the path-dilation ratio (mean shortest
path after/before) and connectivity changes.
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
import _common  # noqa: F401,E402

import numpy as np  # noqa: E402
from scipy.sparse.csgraph import connected_components  # noqa: E402

from vqvae_tpu.cli.build_codebook_legacy import _reweight_graph_with_riemannian  # noqa: E402
from vqvae_tpu.cli.quality_checks import _load_vae  # noqa: E402
from vqvae_tpu.ops import build_knn_graph  # noqa: E402
from vqvae_tpu.ops.backend import multi_source_distances  # noqa: E402
from vqvae_tpu.ops.riemannian import make_decoder_image_fn  # noqa: E402
from vqvae_tpu.utils.latents import load_latents  # noqa: E402


def mean_shortest_path(W, n_sources: int = 32, seed: int = 0) -> float:
    rng = np.random.default_rng(seed)
    sources = rng.choice(W.shape[0], size=min(n_sources, W.shape[0]),
                         replace=False)
    D = multi_source_distances(W, sources)
    finite = D[np.isfinite(D) & (D > 0)]
    return float(finite.mean()) if finite.size else float("inf")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("experiment_dir", type=str)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--max_edges", type=int, default=5000)
    ap.add_argument("--max_points", type=int, default=10000)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    exp = Path(args.experiment_dir)
    model, variables, vae_dir = _load_vae(exp)
    lat = load_latents(vae_dir / "latents_train")
    z = lat["z"]
    if z.ndim == 4:
        z = z.reshape(-1, z.shape[-1])
    z = z[:args.max_points].astype(np.float32)
    decode_fn = make_decoder_image_fn(model, variables, model.topology)

    W_eu, _ = build_knn_graph(z, k=args.k, sym="union")
    ncomp_eu, _ = connected_components(W_eu, directed=False)
    sp_eu = mean_shortest_path(W_eu, seed=args.seed)

    W_riem_raw = _reweight_graph_with_riemannian(
        W_eu, z, decode_fn, mode="subset", max_edges=args.max_edges,
        seed=args.seed)
    # The reference computes the ratio on RAW mixed units — Riemannian
    # lengths (decoder-Jacobian units) spliced into a Euclidean-weighted
    # graph (reference experiments/geo/run_riemann_experiments.py:146-152)
    # — so its R depends on the decoder's output scale. Report that raw
    # ratio for protocol parity, AND a unit-free one where the total edge
    # weight is renormalized so R isolates the re-weighting's effect on
    # path STRUCTURE from the unit mismatch.
    sp_riem_raw = mean_shortest_path(W_riem_raw, seed=args.seed)
    ratio_raw = sp_riem_raw / max(sp_eu, 1e-12)
    scale = W_eu.sum() / max(W_riem_raw.sum(), 1e-12)
    W_riem = W_riem_raw * scale
    ncomp_riem, _ = connected_components(W_riem, directed=False)
    sp_riem = mean_shortest_path(W_riem, seed=args.seed)

    ratio = sp_riem / max(sp_eu, 1e-12)
    results = {
        "k": args.k, "n_points": int(len(z)), "max_edges": args.max_edges,
        "components_euclidean": int(ncomp_eu),
        "components_riemannian": int(ncomp_riem),
        "mean_sp_euclidean": sp_eu,
        "mean_sp_riemannian": sp_riem,
        "path_dilation_ratio": ratio,
        "mean_sp_riemannian_raw": sp_riem_raw,
        "path_dilation_ratio_raw": ratio_raw,
    }
    print(json.dumps(results, indent=2))
    out = exp / "riemann_graph_effect.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"[exp] connectivity unchanged: {ncomp_eu == ncomp_riem}; "
          f"dilation ratio R={ratio:.3f} (unit-free), "
          f"R_raw={ratio_raw:.3f} (reference's mixed-unit protocol; "
          f"it reported R_raw=1.152 on MNIST, "
          f"docs/geo/riemann_graph_effect.md:55-66)")


if __name__ == "__main__":
    main()
