"""Baseline VQ-VAE train + eval bridge end-to-end (CPU, tiny)."""
import json
import subprocess
import sys
from pathlib import Path

import pytest
import yaml

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_baseline_pipeline_end_to_end(tmp_path):
    cfg = {
        "seed": 0,
        "out_dir": str(tmp_path / "baseline"),
        "data": {"root": "./data", "name": "CIFAR10", "img_size": 32,
                 "synthetic_size": 128},
        "train": {"batch_size": 32, "epochs": 2, "lr": 2e-4,
                  "weight_decay": 0.0, "grad_clip": 1.0},
        "model": {"in_channels": 3, "z_channels": 16, "hidden": 32,
                  "n_res_blocks": 1, "n_codes": 32, "beta": 0.25,
                  "ema_decay": 0.99, "ema_eps": 1e-5},
        "log": {"samples_every": 1, "save_best": True},
    }
    cfg_path = tmp_path / "config.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    env = {"VQVAE_TPU_PLATFORM": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"}
    import os

    env = {**os.environ, "VQVAE_TPU_PLATFORM": "cpu"}
    r = subprocess.run([sys.executable, str(REPO / "scripts" / "train_baseline_vqvae.py"),
                        "--config", str(cfg_path)],
                       cwd=tmp_path, env=env, capture_output=True, text=True,
                       timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "baseline" / "checkpoints" / "best").exists()
    assert list((tmp_path / "baseline").glob("recon_epoch*.png"))

    r = subprocess.run([sys.executable, str(REPO / "scripts" / "evaluate_baseline_simple.py"),
                        "--config", str(cfg_path), "--max_samples", "64"],
                       cwd=tmp_path, env=env, capture_output=True, text=True,
                       timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    eval_dir = tmp_path / "baseline" / "evaluation"
    results = json.load(open(eval_dir / "evaluation_results.json"))
    assert "recon_psnr" in results and results["codebook_size"] == 32
    assert (eval_dir / "generated_samples.png").exists()
    assert (eval_dir / "metrics.yaml").exists()
    health = json.load(open(eval_dir / "codebook_health.json"))
    assert "health_assessment" in health

    # standalone codebook metric evaluator (reference
    # eval_codebook_metrics.py parity: print + CSV append)
    r = subprocess.run([sys.executable, str(REPO / "scripts" / "eval_codebook_metrics.py"),
                        "--config", str(cfg_path), "--split", "test"],
                       cwd=tmp_path, env=env, capture_output=True, text=True,
                       timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "perplex:" in r.stdout and "usage:" in r.stdout
    csv_path = tmp_path / "baseline" / "codebook_eval_test.csv"
    lines = csv_path.read_text().strip().splitlines()
    assert lines[0].startswith("split,loss,rec,vq,q_mse,perplex,usage,dead")
    vals = lines[1].split(",")
    assert vals[0] == "test" and all(float(v) == float(v) for v in vals[1:])
