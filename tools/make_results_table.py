#!/usr/bin/env python
"""Emit the reference's appendix-style results tables from evaluation
artifacts (reference template/appendix.md:100-113, main.tex:128-135).

Scans ``experiments/**/evaluation/`` for metrics.yaml (generation-quality
PSNR/SSIM/LPIPS vs real images) and quantization_analysis.json (the
quantization-loss PSNR/SSIM pairs), and renders one document (markdown by
default, LaTeX with ``--format latex`` for ``paper/main.tex``):

- Table 1: per-method comparison with the best value per column bolded,
- Table 2: quantization-loss analysis (real vs continuous vs quantized),
- Figure 1: the per-method comparison grids.

Usage:
    python tools/make_results_table.py [--root experiments] [--out FILE]
    python tools/make_results_table.py --format latex \
        --out paper/results_tables.tex
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _load_yaml(path: Path) -> dict:
    import yaml

    with open(path) as f:
        return yaml.safe_load(f) or {}


def _fmt(v, best: bool, nd: int) -> str:
    if v is None:
        return "—"
    s = f"{float(v):.{nd}f}"
    return f"**{s}**" if best else s


def collect(root: Path):
    rows = []
    for metrics in sorted(root.glob("**/evaluation/metrics.yaml")):
        run_dir = metrics.parent.parent
        method = "/".join(run_dir.relative_to(root).parts)
        m = _load_yaml(metrics)
        row = {
            "method": method,
            "psnr": float(m["PSNR"]) if m.get("PSNR") is not None else None,
            "ssim": float(m["SSIM"]) if m.get("SSIM") is not None else None,
            "lpips": (float(m["LPIPS"])
                      if m.get("LPIPS") not in (None, "null") else None),
            "grid": None,
            "quant": None,
        }
        grid = metrics.parent / "comparison_grid.png"
        if grid.exists():
            row["grid"] = grid.as_posix()
        qpath = metrics.parent / "quantization_analysis.json"
        if qpath.exists():
            row["quant"] = json.loads(qpath.read_text())
        rows.append(row)
    return rows


def render(rows, root: Path) -> str:
    out = ["# Results", ""]
    if not rows:
        return "# Results\n\n(no evaluation artifacts found)\n"

    def best(key, hi=True):
        vals = [r[key] for r in rows if r[key] is not None]
        if not vals:
            return None
        return max(vals) if hi else min(vals)

    b_psnr, b_ssim = best("psnr"), best("ssim")
    b_lpips = best("lpips", hi=False)
    has_lpips = any(r["lpips"] is not None for r in rows)

    out += [f"**Table 1 — Quantization Method Comparison** (from `{root}`)",
            ""]
    head = "| Method | PSNR (dB) | SSIM |" + (" LPIPS |" if has_lpips else "")
    sep = "|---|---|---|" + ("---|" if has_lpips else "")
    out += [head, sep]
    for r in rows:
        line = (f"| {r['method']} "
                f"| {_fmt(r['psnr'], r['psnr'] == b_psnr, 2)} "
                f"| {_fmt(r['ssim'], r['ssim'] == b_ssim, 4)} |")
        if has_lpips:
            line += f" {_fmt(r['lpips'], r['lpips'] == b_lpips, 4)} |"
        out.append(line)
    out.append("")

    quant_rows = [r for r in rows if r["quant"]]
    if quant_rows:
        out += ["**Table 2 — Quantization-loss analysis** "
                "(PSNR dB / SSIM; continuous→quantized isolates the "
                "codebook's cost)", "",
                "| Method | real→cont | real→quant | cont→quant |",
                "|---|---|---|---|"]
        for r in quant_rows:
            q = r["quant"]
            out.append(
                f"| {r['method']} "
                f"| {q['psnr_real_vs_continuous']:.2f} / "
                f"{q['ssim_real_vs_continuous']:.4f} "
                f"| {q['psnr_real_vs_quantized']:.2f} / "
                f"{q['ssim_real_vs_quantized']:.4f} "
                f"| {q['psnr_continuous_vs_quantized']:.2f} / "
                f"{q['ssim_continuous_vs_quantized']:.4f} |")
        out.append("")

    grids = [r for r in rows if r["grid"]]
    if grids:
        out += ["**Figure 1 — Qualitative comparison** (top: originals, "
                "bottom: reconstructions)", "",
                "| " + " | ".join(r["method"] for r in grids) + " |",
                "|" + "---|" * len(grids),
                "| " + " | ".join(f"![{r['method']}]({r['grid']})"
                                  for r in grids) + " |", ""]
    return "\n".join(out)


def _tex(s: str) -> str:
    for ch in "&%$#_{}":
        s = s.replace(ch, "\\" + ch)
    return s


def _fmt_tex(v, best: bool, nd: int) -> str:
    if v is None:
        return "---"
    s = f"{float(v):.{nd}f}"
    return rf"\textbf{{{s}}}" if best else s


def render_latex(rows, root: Path) -> str:
    """Booktabs tables for ``paper/main.tex`` (same content as the
    markdown renderer; reference main.tex:128-135 publishes the
    equivalent comparison table)."""
    out = [f"% auto-generated by tools/make_results_table.py from {root}",
           "% regenerate: python tools/make_results_table.py "
           "--format latex --out paper/results_tables.tex"]
    if not rows:
        return "\n".join(out + ["% (no evaluation artifacts found)", ""])

    def best(key, hi=True):
        vals = [r[key] for r in rows if r[key] is not None]
        return (max(vals) if hi else min(vals)) if vals else None

    b_psnr, b_ssim = best("psnr"), best("ssim")
    b_lpips = best("lpips", hi=False)
    has_lpips = any(r["lpips"] is not None for r in rows)
    cols = "lrr" + ("r" if has_lpips else "")
    head = (r"Method & PSNR (dB) $\uparrow$ & SSIM $\uparrow$"
            + (r" & LPIPS $\downarrow$" if has_lpips else "") + r" \\")
    out += [r"\begin{table}[t]", r"\centering",
            r"\caption{Quantization method comparison.}",
            r"\label{tab:comparison}",
            rf"\begin{{tabular}}{{{cols}}}", r"\toprule", head, r"\midrule"]
    for r in rows:
        line = (f"{_tex(r['method'])} & "
                f"{_fmt_tex(r['psnr'], r['psnr'] == b_psnr, 2)} & "
                f"{_fmt_tex(r['ssim'], r['ssim'] == b_ssim, 4)}")
        if has_lpips:
            line += f" & {_fmt_tex(r['lpips'], r['lpips'] == b_lpips, 4)}"
        out.append(line + r" \\")
    out += [r"\bottomrule", r"\end{tabular}", r"\end{table}", ""]

    quant_rows = [r for r in rows if r["quant"]]
    if quant_rows:
        out += [r"\begin{table}[t]", r"\centering",
                r"\caption{Quantization-loss analysis (PSNR dB / SSIM); "
                r"continuous$\to$quantized isolates the codebook's cost.}",
                r"\label{tab:quantization-loss}",
                r"\begin{tabular}{lccc}", r"\toprule",
                r"Method & real$\to$cont & real$\to$quant "
                r"& cont$\to$quant \\", r"\midrule"]
        for r in quant_rows:
            q = r["quant"]
            out.append(
                f"{_tex(r['method'])} & "
                f"{q['psnr_real_vs_continuous']:.2f} / "
                f"{q['ssim_real_vs_continuous']:.4f} & "
                f"{q['psnr_real_vs_quantized']:.2f} / "
                f"{q['ssim_real_vs_quantized']:.4f} & "
                f"{q['psnr_continuous_vs_quantized']:.2f} / "
                f"{q['ssim_continuous_vs_quantized']:.4f}" + r" \\")
        out += [r"\bottomrule", r"\end{tabular}", r"\end{table}", ""]

    grids = [r for r in rows if r["grid"]]
    if grids:
        w = max(0.95 / len(grids) - 0.01, 0.1)
        out += [r"\begin{figure}[t]", r"\centering"]
        for r in grids:
            out += [rf"\begin{{subfigure}}{{{w:.2f}\textwidth}}",
                    rf"  \includegraphics[width=\textwidth]{{{r['grid']}}}",
                    rf"  \caption{{{_tex(r['method'])}}}",
                    r"\end{subfigure}"]
        out += [r"\caption{Qualitative comparison (top: originals, "
                r"bottom: reconstructions).}",
                r"\label{fig:comparison}", r"\end{figure}", ""]
    return "\n".join(out)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="experiments", type=Path)
    ap.add_argument("--out", default=None, type=Path)
    ap.add_argument("--format", choices=("markdown", "latex"),
                    default="markdown")
    args = ap.parse_args(argv)
    renderer = render_latex if args.format == "latex" else render
    doc = renderer(collect(args.root), args.root)
    if args.out:
        args.out.parent.mkdir(parents=True, exist_ok=True)
        args.out.write_text(doc)
        print(f"wrote {args.out}")
    else:
        print(doc)


if __name__ == "__main__":
    main()
