"""Demo / visualization / experiment script smoke tests (CPU subprocesses)."""
import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
ENV = {**os.environ, "VQVAE_TPU_PLATFORM": "cpu"}


def _run(args, cwd, timeout=300):
    r = subprocess.run([sys.executable] + args, cwd=cwd, env=ENV,
                       capture_output=True, text=True, timeout=timeout)
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-1500:])
    return r


@pytest.mark.slow
def test_interactive_exploration_demo(tmp_path):
    _run([str(REPO / "demos" / "interactive_exploration.py"), "--n", "300",
          "--out", str(tmp_path / "knn.png")], cwd=tmp_path)
    assert (tmp_path / "knn.png").exists()


@pytest.mark.slow
def test_riemann_sanity_experiment(tmp_path):
    r = _run([str(REPO / "experiments_geo" / "riemann_sanity_check.py"),
              "--n_edges", "200"], cwd=tmp_path)
    assert "sanity: OK" in r.stdout


@pytest.mark.slow
def test_knn_experiments_viz(tmp_path):
    _run([str(REPO / "visualizations" / "knn_experiments.py"), "--n", "800",
          "--ks", "5", "8", "--out", str(tmp_path / "k.png")],
         cwd=REPO / "visualizations")
    assert (tmp_path / "k.png").exists()


@pytest.mark.slow
def test_interactive_knn_viz_headless(tmp_path):
    env = dict(ENV)
    env.pop("DISPLAY", None)
    r = subprocess.run([sys.executable,
                        str(REPO / "visualizations" / "interactive_knn_viz.py"),
                        "--n", "300", "--out", str(tmp_path / "viz.png")],
                       cwd=tmp_path, env=env, capture_output=True, text=True,
                       timeout=300)
    assert r.returncode == 0, r.stderr[-1500:]
    assert (tmp_path / "viz.png").exists()


@pytest.mark.slow
def test_compare_all_approaches(tmp_path):
    # synthesize two approach dirs with result files
    for name, psnr in [("a", 20.0), ("b", 25.0)]:
        d = tmp_path / name / "evaluation"
        d.mkdir(parents=True)
        with open(d / "metrics.yaml", "w") as f:
            f.write(f"PSNR: '{psnr}'\nSSIM: '0.5'\n")
        with open(d / "codebook_health.json", "w") as f:
            json.dump({"entropy": 3.0, "used_codes": 100,
                       "usage_percent": 78.0}, f)
    out = tmp_path / "cmp"
    _run([str(REPO / "scripts" / "compare_all_approaches.py"),
          "--approaches", f"a={tmp_path/'a'}", f"b={tmp_path/'b'}",
          "--out_dir", str(out)], cwd=tmp_path)
    assert (out / "comparison_table.csv").exists()
    assert (out / "comparison_report.md").exists()
    report = (out / "comparison_report.md").read_text()
    assert "Best PSNR:" in report and "b" in report
