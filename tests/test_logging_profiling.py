"""Unit tests for MetricsLogger (CSV/JSONL contract) and stage_timer."""
import csv
import json

from vqvae_tpu.utils.logging import MetricsLogger
from vqvae_tpu.utils.profiling import stage_timer


def test_metrics_logger_csv_jsonl(tmp_path):
    log = MetricsLogger(tmp_path, run_name="t")
    log.log_params({"lr": 1e-3, "name": "x"})
    log.log_metrics({"loss": 1.5, "psnr": 20.0}, step=0)
    log.log_metrics({"loss": 1.25, "psnr": 21.0}, step=1)
    log.end()

    rows = list(csv.DictReader(open(tmp_path / "metrics.csv")))
    assert len(rows) == 2
    assert float(rows[1]["loss"]) == 1.25 and rows[1]["step"] == "1"
    jl = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert jl[0]["psnr"] == 20.0 and "wall_time_s" in jl[0]
    assert (tmp_path / "params.yaml").read_text().startswith("lr:")


def test_metrics_logger_extra_keys_ignored_in_csv(tmp_path):
    # fields are fixed by the first row; later extra keys must not crash
    log = MetricsLogger(tmp_path)
    log.log_metrics({"loss": 1.0}, step=0)
    log.log_metrics({"loss": 0.5, "new_metric": 7.0}, step=1)
    rows = list(csv.DictReader(open(tmp_path / "metrics.csv")))
    assert len(rows) == 2 and "new_metric" not in rows[0]
    # but JSONL keeps everything
    jl = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert jl[1]["new_metric"] == 7.0


def test_stage_timer_accumulates_sink():
    sink = {}
    with stage_timer("a", sink):
        pass
    with stage_timer("a", sink):
        pass
    assert "a" in sink and sink["a"] >= 0.0
