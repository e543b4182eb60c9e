"""CIFAR-10 spatial geodesic pipeline e2e (3-channel, 32px, normalized
inputs — exercises the code paths FashionMNIST does not)."""
from pathlib import Path

import numpy as np
import pytest
import yaml

from vqvae_tpu.cli.pipeline import run_pipeline


@pytest.mark.slow
def test_cifar_spatial_geodesic_pipeline(tmp_path):
    exp = str(tmp_path / "exp")
    vae_dir = f"{exp}/vae/spatial_vae_cifar10"
    arch = {"enc_channels": [8, 16, 32], "dec_channels": [32, 16, 8],
            "latent_dim": 4}
    tf_model = {"num_tokens": 24, "embed_dim": 32, "n_layers": 2, "n_head": 2}
    ov = {
        "vae": {"max_epochs": 2, "early_stop": 0, "out_dir": f"{exp}/vae",
                "data": {"synthetic_size": 256, "batch_size": 64},
                "model": arch},
        "codebook": {"latents_path": f"{vae_dir}/latents_train",
                     "vae_ckpt_path": f"{vae_dir}/checkpoints/best",
                     "out_dir": f"{exp}/codebook",
                     "vae": arch, "graph": {"k": 6}, "quantize": {"K": 24}},
        "transformer": {"data": {"codes_path": f"{exp}/codebook/codes.npy",
                                 "labels_path": f"{vae_dir}/latents_train",
                                 "batch_size": 64},
                        "training": {"epochs": 2},
                        "out": {"dir": f"{exp}/transformer"},
                        "model": tf_model},
        "generate": {"transformer_ckpt_path": f"{exp}/transformer/checkpoints/best",
                     "vae_ckpt_path": f"{vae_dir}/checkpoints/best",
                     "codebook_path": f"{exp}/codebook/codebook.npz",
                     "transformer": tf_model, "vae": arch,
                     "num_samples": 20, "samples_per_class": 2, "top_k": 10,
                     "output_dir": f"{exp}/evaluation"},
        "evaluate": {"generated_path": f"{exp}/evaluation/generated_samples.png",
                     "num_samples": 20, "samples_per_class": 2,
                     "out_dir": f"{exp}/evaluation",
                     "data": {"dataset_name": "cifar10",
                              "synthetic_size": 128}},
    }
    run_pipeline("configs/cifar10/spatial/geodesic", overrides=ov)
    exp = Path(exp)
    codes = np.load(exp / "codebook/codes.npy")
    assert codes.shape[1:] == (4, 4)
    metrics = yaml.safe_load(open(exp / "evaluation/metrics.yaml"))
    assert "PSNR" in metrics
    # generated grid must be RGB 32px cells
    from PIL import Image

    img = Image.open(exp / "evaluation/generated_samples.png")
    assert img.mode == "RGB"
