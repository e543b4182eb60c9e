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


def test_probe_backend_retries_then_raises(monkeypatch):
    """probe_backend must bound its retries, back off between attempts, and
    raise (not hang) when the backend stays down — the round-4 capture was
    lost to an unbounded single-shot init (VERDICT r4 weak item 1)."""
    import bench

    calls = []
    sleeps = []

    class FakeProc:
        returncode = 1
        stderr = "Unable to initialize backend 'axon': UNAVAILABLE"
        stdout = ""

    def fake_run(cmd, **kw):
        calls.append(cmd)
        return FakeProc()

    monkeypatch.setenv("BENCH_INIT_RETRIES", "3")
    monkeypatch.setenv("BENCH_INIT_BACKOFF", "7")
    monkeypatch.delenv("BENCH_SKIP_PROBE", raising=False)
    monkeypatch.delenv("VQVAE_TPU_PLATFORM", raising=False)
    monkeypatch.setattr("subprocess.run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", sleeps.append)
    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        bench.probe_backend()
    assert len(calls) == 3
    assert sleeps == [7.0, 14.0]  # doubling backoff, none after the last


def test_probe_backend_skips_on_cpu(monkeypatch):
    import bench

    monkeypatch.setenv("VQVAE_TPU_PLATFORM", "cpu")
    assert bench.probe_backend() == {"skipped": True}


def test_emit_failure_prints_contract_line(capsys):
    """Any bench failure must still print ONE parseable JSON line with
    value=null and a structured error (the driver records stdout verbatim)."""
    import bench

    bench.emit_failure("backend-probe", RuntimeError("weather"),
                       {"nodes": 5})
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    rec = json.loads(out[0])
    assert rec["metric"] == "geodesic_codebook_build_seconds"
    assert rec["value"] is None
    assert rec["detail"]["error"] == {"stage": "backend-probe",
                                      "type": "RuntimeError",
                                      "message": "weather"}
    assert rec["detail"]["nodes"] == 5
