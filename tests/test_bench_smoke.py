"""bench.py must always emit its one-line JSON contract.

The driver runs ``python bench.py`` at the end of every round and records
the line as the round's headline artifact — a regression there loses the
round's measurement, so the contract is guarded here at a tiny CPU shape
(slow: ~1 min single-core).
"""
import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_bench_emits_contract_json():
    env = {**os.environ,
           "VQVAE_TPU_PLATFORM": "cpu",
           "BENCH_NODES": "2048", "BENCH_CODES": "8", "BENCH_KNN": "6",
           "BENCH_RUNS": "1", "BENCH_BASELINE": "0"}
    out = subprocess.run([sys.executable, str(REPO / "bench.py")],
                         capture_output=True, text=True, env=env,
                         cwd=str(REPO), timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE json line, got: {out.stdout!r}"
    rec = json.loads(lines[0])
    assert rec["metric"] == "geodesic_codebook_build_seconds"
    assert rec["unit"] == "s"
    assert rec["value"] > 0
    detail = rec["detail"]
    for key in ("stage_seconds", "qe", "lcc_nodes", "knn_mode",
                "riem_engine", "relaxation_sweeps"):
        assert key in detail, key
    assert set(detail["stage_seconds"]) == {"knn", "riemannian", "kmedoids"}
