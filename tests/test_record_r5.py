"""tools/record_r5_results.py — the round-5 queue-artifact folder.

The capture queue may finish unattended; this tool is what turns its raw
JSON into docs/benchmarks.md + README prose. Tests pin the marker
idempotency, the partial-artifact path, and the pre-registered Pallas
sweep verdict rule (docs/benchmarks.md "Round 5: Pallas kNN selection
floor").
"""
import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def load_tool(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "record_r5_results", REPO / "tools" / "record_r5_results.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    repo = tmp_path / "repo"
    (repo / "docs" / "runs").mkdir(parents=True)
    (repo / "docs" / "benchmarks.md").write_text("# bench history\n")
    (repo / "README.md").write_text(
        "# readme\nblah Round 2's driver artifact was 153.8 s / ~40x line\n"
        "tail\n")
    monkeypatch.setattr(mod, "REPO", repo)
    monkeypatch.setattr(mod, "RUNS", repo / "docs" / "runs")
    return mod, repo


def bench_artifact(total, knn=16.0, riem=4.1, kmed=21.0, vs=90.0,
                   engine="mlp"):
    return {"metric": "codebook_build_seconds", "value": total, "unit": "s",
            "vs_baseline": vs,
            "detail": {"stage_seconds": {"knn": knn, "riemannian": riem,
                                         "kmedoids": kmed},
                       "runs": [total + 1, total, total - 1],
                       "riem_engine": engine, "riem_achieved_tflops": 30.1,
                       "knn_achieved_tflops": 2.0, "knn_mode":
                       "approx-pallas-fused", "knn_packed": False,
                       "relaxation_gbps": 36.0, "relaxation_sweeps": 41,
                       "qe": 52.6e6}}


def test_no_artifacts_is_noop(tmp_path, monkeypatch):
    mod, repo = load_tool(tmp_path, monkeypatch)
    monkeypatch.setattr(sys, "argv", ["record_r5_results.py"])
    assert mod.main() == 1
    assert "R5-QUEUE-RESULTS" not in (repo / "docs/benchmarks.md").read_text()


def test_partial_then_full_idempotent(tmp_path, monkeypatch):
    mod, repo = load_tool(tmp_path, monkeypatch)
    runs = repo / "docs" / "runs"
    (runs / "bench-r5-k10.json").write_text(json.dumps(bench_artifact(55.0)))
    monkeypatch.setattr(sys, "argv", ["record_r5_results.py"])
    assert mod.main() == 0
    bench = (repo / "docs/benchmarks.md").read_text()
    readme = (repo / "README.md").read_text()
    assert "55.0 s" in bench and "90.0x" in bench
    assert "Not yet captured" in bench
    assert "Round-5 driver-queue capture" in readme
    # README note inserted after the anchor line, before "tail"
    assert readme.index("153.8") < readme.index("driver-queue capture") \
        < readme.index("tail")

    # second run with more artifacts REPLACES the block (no duplicates)
    (runs / "bench-r5-k20.json").write_text(json.dumps(bench_artifact(78.0)))
    for i in (1, 2, 3):
        (runs / f"fullscale-fashion-timings-r5-rep{i}.json").write_text(
            json.dumps({"vae": 120.0, "codebook": 200.0, "quality": 25.0,
                        "transformer": 50.0, "generate": 15.0,
                        "evaluate": 0.1, "total": 410.0 + i}))
    assert mod.main() == 0
    bench = (repo / "docs/benchmarks.md").read_text()
    assert bench.count("R5-QUEUE-RESULTS:BEGIN") == 1
    assert "78.0 s" in bench
    assert "412 s" in bench and "north star: MET" in bench
    readme = (repo / "README.md").read_text()
    assert readme.count("R5-CAPTURE-NOTE:BEGIN") == 1
    assert "78.0 s" in readme


def test_sweep_verdict_rule(tmp_path, monkeypatch):
    mod, repo = load_tool(tmp_path, monkeypatch)

    def sweep(control_s, packed_s):
        return {"nodes": 983040, "k": 10, "results": {
            "pallas-1024x4096x1024x128x4x0":
                {"seconds": control_s, "recall_vs_exact": 0.9999},
            "pallas-1024x4096x1024x128x4x1":
                {"seconds": packed_s, "recall_vs_exact": 0.9999},
            "1024x4096-approx1": {"seconds": 17.0},
        }}

    runs = repo / "docs" / "runs"
    monkeypatch.setattr(sys, "argv", ["record_r5_results.py"])
    # packed 16.0 -> 10.0 = 1.6x >= 1.3 -> flip default
    (runs / "knn-pallas-sweep-r5.json").write_text(
        json.dumps(sweep(16.0, 10.0)))
    assert mod.main() == 0
    text = (repo / "docs/benchmarks.md").read_text()
    assert "flip the VQVAE_TPU_KNN_PACKED default" in text

    # 16.0 -> 15.0 = 1.07x < 1.15 -> DONE at floor
    (runs / "knn-pallas-sweep-r5.json").write_text(
        json.dumps(sweep(16.0, 15.0)))
    assert mod.main() == 0
    text = (repo / "docs/benchmarks.md").read_text()
    assert "stage DONE at the measured floor" in text
    assert "flip the VQVAE_TPU_KNN_PACKED default" not in text

    # 16.0 -> 13.0 = 1.23x in between -> opt-in
    (runs / "knn-pallas-sweep-r5.json").write_text(
        json.dumps(sweep(16.0, 13.0)))
    assert mod.main() == 0
    text = (repo / "docs/benchmarks.md").read_text()
    assert "below the 1.3x flip bar" in text


def test_failed_capture_renders_error(tmp_path, monkeypatch):
    mod, repo = load_tool(tmp_path, monkeypatch)
    (repo / "docs/runs/bench-r5-k10.json").write_text(json.dumps(
        {"metric": "codebook_build_seconds", "value": None, "unit": "s",
         "vs_baseline": None,
         "detail": {"error": {"stage": "backend-probe",
                              "type": "RuntimeError", "msg": "UNAVAILABLE"}}}))
    monkeypatch.setattr(sys, "argv", ["record_r5_results.py"])
    assert mod.main() == 0
    text = (repo / "docs/benchmarks.md").read_text()
    assert "Capture FAILED at stage `backend-probe`" in text
    # no README note for a failed capture
    assert "R5-CAPTURE-NOTE" not in (repo / "README.md").read_text()


def test_sweep_tolerates_per_case_errors(tmp_path, monkeypatch):
    """bench_knn --out checkpoints partial sweeps; a crashed case lands as
    {"error": ...} and must not break the fold (it renders as FAILED)."""
    mod, repo = load_tool(tmp_path, monkeypatch)
    (repo / "docs/runs/knn-pallas-sweep-r5.json").write_text(json.dumps(
        {"nodes": 983040, "k": 10, "results": {
            "pallas-1024x4096x1024x128x4x0":
                {"seconds": 16.5, "recall_vs_exact": 0.9999},
            "pallas-1024x8192x1024x256x4x1":
                {"error": "XlaRuntimeError: RESOURCE_EXHAUSTED: vmem"},
        }}))
    monkeypatch.setattr(sys, "argv", ["record_r5_results.py"])
    assert mod.main() == 0
    text = (repo / "docs/benchmarks.md").read_text()
    assert "FAILED: pallas-1024x8192x1024x256x4x1" in text
    assert "16.5" in text
