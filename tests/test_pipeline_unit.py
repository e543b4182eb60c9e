"""Fast unit tests for pipeline preset validation (no stages run)."""
import pytest

from vqvae_tpu.cli.pipeline import STAGES, run_pipeline


def test_missing_preset_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="preset directory not found"):
        run_pipeline(tmp_path / "nope")


def test_empty_preset_dir_raises(tmp_path):
    (tmp_path / "empty").mkdir()
    with pytest.raises(FileNotFoundError, match="no stage configs"):
        run_pipeline(tmp_path / "empty")


def test_all_stages_skipped_returns_total_only(tmp_path):
    d = tmp_path / "p"
    d.mkdir()
    (d / "vae.yaml").write_text("out_dir: x\n")
    timings = run_pipeline(d, skip=set(STAGES), root_dir=tmp_path)
    assert set(timings) == {"total"}


def test_timings_dump_env(tmp_path, monkeypatch):
    import json

    d = tmp_path / "p"
    d.mkdir()
    (d / "vae.yaml").write_text("out_dir: x\n")
    out = tmp_path / "timings.json"
    monkeypatch.setenv("VQVAE_TPU_TIMINGS_PATH", str(out))
    run_pipeline(d, skip=set(STAGES), root_dir=tmp_path)
    rec = json.loads(out.read_text())
    assert "total" in rec and "programs_compiled" in rec


def test_stage_order_contract():
    # the five-stage contract plus the quality gate, in execution order
    assert tuple(STAGES) == ("vae", "codebook", "quality", "transformer",
                             "generate", "evaluate")


def _run_quality_gate(tmp_path, monkeypatch, mu):
    """Drive evaluate_vae_quality_main with stubbed VAE/latents/decodes so
    only the rating logic runs."""
    import json

    import numpy as np

    from vqvae_tpu.cli import quality_checks as qc

    vae_dir = tmp_path / "vae"
    vae_dir.mkdir(exist_ok=True)
    z = mu + 0.01 * np.random.RandomState(0).randn(*mu.shape).astype(
        np.float32)
    monkeypatch.setattr(qc, "_load_vae",
                        lambda exp: (None, None, vae_dir))
    monkeypatch.setattr(qc, "load_latents",
                        lambda p: {"z": z, "mu": mu})
    # decoder that IGNORES its latent: identical constant images for z and
    # mu -> infinite PSNR, the failure mode the collapse detector must catch
    monkeypatch.setattr(
        qc, "_decode_sweep",
        lambda model, variables, lat, ds, bs: np.full(
            (len(lat), 8, 8, 1), 0.5, np.float32))
    rc = qc.evaluate_vae_quality_main(tmp_path, dataset="fashionmnist")
    report = json.loads((vae_dir / "vae_quality_assessment.json").read_text())
    return rc, report


def test_quality_gate_flags_posterior_collapse(tmp_path, monkeypatch):
    """A decoder that ignores z scores a perfect x(z)-vs-x(mu) PSNR; the
    gate must not rate it excellent when mu carries no information (the
    reference gate does — its CIFAR spatial run passes at 120 dB)."""
    import numpy as np

    mu = np.zeros((64, 16), np.float32)  # collapsed: var(mu) == 0
    rc, report = _run_quality_gate(tmp_path, monkeypatch, mu)
    assert rc == 1
    assert report["posterior_collapse_suspected"] is True
    assert report["quality_rating"] == "poor"
    assert report["recommendation"] == "retrain"


def test_quality_gate_passes_informative_latents(tmp_path, monkeypatch):
    import numpy as np

    mu = np.random.RandomState(1).randn(64, 16).astype(np.float32)
    rc, report = _run_quality_gate(tmp_path, monkeypatch, mu)
    assert rc == 0
    assert report["posterior_collapse_suspected"] is False
    assert report["quality_rating"] == "excellent"
