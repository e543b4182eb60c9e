"""Checkpoint resume through the stage entry points."""
import numpy as np
import pytest

from vqvae_tpu.config import Config
from vqvae_tpu.cli.train_vae import train_vae_main
from vqvae_tpu.utils.checkpoint import Checkpointer


def _vae_cfg(out_dir, epochs, resume=False):
    return Config({
        "seed": 0, "max_epochs": epochs, "lr": 1e-3, "weight_decay": 0.0,
        "early_stop": 0, "out_dir": str(out_dir), "save_latents": False,
        "resume": resume,
        "data": {"name": "FashionMNIST", "root": "data", "batch_size": 64,
                 "synthetic_size": 192},
        "model": {"in_channels": 1, "output_image_size": 28, "latent_dim": 4,
                  "enc_channels": [8, 16, 32], "dec_channels": [32, 16, 8],
                  "recon_loss": "mse", "beta": 1.0, "norm_type": "none",
                  "mse_use_sigmoid": True, "topology": "flat"},
    })


@pytest.mark.slow
def test_vae_resume_continues_from_latest(tmp_path):
    out = tmp_path / "vae"
    train_vae_main(_vae_cfg(out, epochs=2))
    ck = Checkpointer(out / "checkpoints")
    step_after_first = int(np.asarray(ck.restore("latest")["step"]))
    assert step_after_first > 0

    train_vae_main(_vae_cfg(out, epochs=1, resume=True))
    step_after_resume = int(np.asarray(ck.restore("latest")["step"]))
    assert step_after_resume > step_after_first  # optimizer step continued
