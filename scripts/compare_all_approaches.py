#!/usr/bin/env python
"""Aggregate and compare metrics across approaches.

Parity with reference scripts/compare_all_approaches.py: tolerant
multi-format result loading (metrics.yaml / evaluation_results.json /
codebook_health.json / quantization_analysis.json), a pandas comparison
table, bar charts + entropy-vs-PSNR scatter, and a markdown summary
report.
"""
import argparse
import json
from pathlib import Path

import _common  # noqa: F401

import numpy as np
import pandas as pd
import yaml


def load_results(approach_dir: Path) -> dict:
    """Tolerant loader over the known result files (reference
    compare_all_approaches.py:18-71)."""
    out = {}
    eval_dir = approach_dir / "evaluation"
    for cand in [eval_dir, approach_dir]:
        my = cand / "metrics.yaml"
        if my.exists():
            data = yaml.safe_load(open(my)) or {}
            for k, v in data.items():
                if v is not None:
                    try:
                        out[k.upper()] = float(v)
                    except (TypeError, ValueError):
                        pass
        for name in ["evaluation_results.json", "codebook_health.json",
                     "quantization_analysis.json"]:
            p = cand / name
            if p.exists():
                data = json.load(open(p))
                for k, v in data.items():
                    if isinstance(v, (int, float)):
                        out.setdefault(k, float(v))
    return out


def extract_metrics(results: dict) -> dict:
    """Normalize heterogeneous keys into the comparison schema."""
    def pick(*keys):
        for k in keys:
            if k in results:
                return results[k]
        return np.nan

    return {
        "psnr": pick("PSNR", "recon_psnr", "psnr_continuous_vs_quantized",
                     "psnr_db"),
        "ssim": pick("SSIM", "recon_ssim", "ssim_continuous_vs_quantized"),
        "lpips": pick("LPIPS", "lpips"),
        "entropy": pick("entropy"),
        "used_codes": pick("used_codes"),
        "usage_percent": pick("usage_percent"),
    }


def create_visualization(df: pd.DataFrame, out_dir: Path) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    metrics = [c for c in ["psnr", "ssim", "lpips", "entropy"]
               if df[c].notna().any()]
    fig, axes = plt.subplots(1, max(len(metrics), 1),
                             figsize=(4 * max(len(metrics), 1), 4))
    if len(metrics) == 1:
        axes = [axes]
    for ax, metric in zip(np.atleast_1d(axes), metrics):
        sub = df[df[metric].notna()]
        ax.bar(sub.index, sub[metric])
        ax.set_title(metric.upper())
        ax.tick_params(axis="x", rotation=45)
    fig.tight_layout()
    fig.savefig(out_dir / "comparison_charts.png", dpi=120)
    plt.close(fig)

    if df["entropy"].notna().any() and df["psnr"].notna().any():
        fig, ax = plt.subplots(figsize=(5, 4))
        sub = df[df["entropy"].notna() & df["psnr"].notna()]
        ax.scatter(sub["entropy"], sub["psnr"])
        for name, row in sub.iterrows():
            ax.annotate(name, (row["entropy"], row["psnr"]), fontsize=8)
        ax.set_xlabel("codebook entropy")
        ax.set_ylabel("PSNR (dB)")
        fig.tight_layout()
        fig.savefig(out_dir / "entropy_vs_psnr.png", dpi=120)
        plt.close(fig)


def generate_summary_report(df: pd.DataFrame, out_dir: Path) -> None:
    lines = ["# Approach comparison", "", df.to_markdown(), ""]
    if df["psnr"].notna().any():
        best = df["psnr"].idxmax()
        lines.append(f"**Best PSNR:** {best} ({df.loc[best, 'psnr']:.2f} dB)")
    if df["lpips"].notna().any():
        best = df["lpips"].idxmin()
        lines.append(f"**Best LPIPS:** {best} ({df.loc[best, 'lpips']:.4f})")
    with open(out_dir / "comparison_report.md", "w") as f:
        f.write("\n".join(lines) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--approaches", nargs="+", default=None,
                    help="name=path pairs; defaults to the standard four")
    ap.add_argument("--out_dir", type=str, default="experiments/comparison")
    args = ap.parse_args()

    if args.approaches:
        pairs = [a.split("=", 1) for a in args.approaches]
    else:  # the reference's four standard approaches (:358-363)
        pairs = [
            ("euclidean_k512", "experiments/fashionmnist/spatial/euclidean"),
            ("geodesic_k512", "experiments/fashionmnist/spatial/geodesic"),
            ("vanilla_euclidean", "experiments/fashionmnist/vanilla/euclidean"),
            ("baseline_vqvae", "experiments/baseline_vqvae"),
        ]

    rows = {}
    for name, path in pairs:
        p = Path(path)
        if not p.exists():
            print(f"[compare] {name}: {path} missing, skipping")
            continue
        rows[name] = extract_metrics(load_results(p))
    if not rows:
        print("[compare] nothing to compare")
        return

    df = pd.DataFrame(rows).T
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    df.to_csv(out_dir / "comparison_table.csv")
    print(df)
    create_visualization(df, out_dir)
    generate_summary_report(df, out_dir)
    print(f"[compare] wrote {out_dir}/comparison_table.csv, charts, report")


if __name__ == "__main__":
    main()
