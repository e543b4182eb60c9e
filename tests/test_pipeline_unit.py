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


def test_stage_order_contract():
    # the five-stage contract plus the quality gate, in execution order
    assert tuple(STAGES) == ("vae", "codebook", "quality", "transformer",
                             "generate", "evaluate")
