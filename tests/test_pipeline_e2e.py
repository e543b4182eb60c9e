"""End-to-end sandbox pipeline tests (mirrors the reference's
test_fast_pipeline.py discipline: run every stage on a tiny preset and
check the artifact contract)."""
from pathlib import Path

import numpy as np
import pytest
import yaml

from vqvae_tpu.cli.pipeline import run_pipeline
from vqvae_tpu.config import load_config


def _tiny_overrides(tmp_path: Path, spatial: bool):
    """Shrink the sandbox preset further for CI-speed runs."""
    exp = str(tmp_path / "exp")
    vae_dir = f"{exp}/vae/spatial_vae_fashionmnist" if spatial else f"{exp}/vae"
    ov = {
        "vae": {"max_epochs": 2, "out_dir": f"{exp}/vae",
                "data": {"synthetic_size": 384, "batch_size": 64},
                "model": {"enc_channels": [8, 16, 32],
                          "dec_channels": [32, 16, 8],
                          "latent_dim": 4 if spatial else 8}},
        "codebook": {"latents_path": f"{vae_dir}/latents_train",
                     "vae_ckpt_path": f"{vae_dir}/checkpoints/best",
                     "out_dir": f"{exp}/codebook",
                     "vae": {"enc_channels": [8, 16, 32],
                             "dec_channels": [32, 16, 8],
                             "latent_dim": 4 if spatial else 8},
                     "graph": {"k": 6},
                     "quantize": {"K": 24}},
        "transformer": {"data": {"codes_path": f"{exp}/codebook/codes.npy",
                                 "labels_path": f"{vae_dir}/latents_train",
                                 "batch_size": 64},
                        "training": {"epochs": 2},
                        "out": {"dir": f"{exp}/transformer"},
                        "model": {"num_tokens": 24 if spatial else 25,
                                  "embed_dim": 32, "n_layers": 2,
                                  "n_head": 2}},
        "generate": {"transformer_ckpt_path": f"{exp}/transformer/checkpoints/best",
                     "vae_ckpt_path": f"{vae_dir}/checkpoints/best",
                     "codebook_path": f"{exp}/codebook/codebook.npz",
                     "transformer": {"num_tokens": 24 if spatial else 25,
                                     "embed_dim": 32, "n_layers": 2,
                                     "n_head": 2},
                     "vae": {"enc_channels": [8, 16, 32],
                             "dec_channels": [32, 16, 8],
                             "latent_dim": 4 if spatial else 8},
                     "num_samples": 20, "samples_per_class": 2,
                     "top_k": 10,
                     "output_dir": f"{exp}/evaluation"},
        "evaluate": {"generated_path": f"{exp}/evaluation/generated_samples.png",
                     "num_samples": 20, "samples_per_class": 2,
                     "out_dir": f"{exp}/evaluation",
                     "data": {"dataset_name": "fashionmnist",
                              "synthetic_size": 128}},
    }
    return exp, ov


@pytest.mark.slow
def test_sandbox_spatial_geodesic_pipeline(tmp_path):
    from vqvae_tpu.utils.profiling import CompileStats

    compiles = CompileStats.install()
    before = compiles.snapshot()
    exp, ov = _tiny_overrides(tmp_path, spatial=True)
    timings = run_pipeline("configs/sandbox-fashion/geodesic", overrides=ov)
    assert set(timings) >= {"vae", "codebook", "transformer", "generate",
                            "evaluate", "total"}
    # program-count regression guard: on the remote-compile TPU platform
    # every program costs minutes, so eager-execution creep is a perf bug.
    # Measured 66 for the full 6-stage run (2026-08, jit-wrapped inits);
    # the pre-fix count was 324.
    n_programs = compiles.delta(before)["programs"]
    assert n_programs <= 120, (
        f"pipeline compiled {n_programs} XLA programs (>120): some stage "
        f"is executing eagerly again — find it with JAX_LOG_COMPILES=1")
    exp = Path(exp)
    # artifact contract
    assert (exp / "vae/spatial_vae_fashionmnist/checkpoints/best").exists()
    assert (exp / "codebook/codebook.npz").exists()
    assert (exp / "codebook/knn_graph_geodesic.npz").exists()
    codes = np.load(exp / "codebook/codes.npy")
    assert codes.ndim == 3 and codes.shape[1:] == (4, 4)
    assert codes.max() < 24
    assert (exp / "transformer/checkpoints/best").exists()
    assert (exp / "evaluation/generated_samples.png").exists()
    metrics = yaml.safe_load(open(exp / "evaluation/metrics.yaml"))
    assert "PSNR" in metrics and "SSIM" in metrics


@pytest.mark.slow
def test_sandbox_vanilla_euclidean_pipeline(tmp_path):
    exp, ov = _tiny_overrides(tmp_path, spatial=False)
    timings = run_pipeline("configs/sandbox-fashion/euclidean", overrides=ov)
    exp = Path(exp)
    assert (exp / "codebook/codebook.npz").exists()
    codes = np.load(exp / "codebook/codes.npy")
    assert codes.ndim == 1  # scalar code per image
    assert (exp / "evaluation/generated_samples.png").exists()
