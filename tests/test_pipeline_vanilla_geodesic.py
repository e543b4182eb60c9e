"""Vanilla geodesic pipeline e2e: legacy Riemannian subset re-weighting
(the one five-stage path the other e2e tests don't cover)."""
from pathlib import Path

import numpy as np
import pytest
import yaml

from vqvae_tpu.cli.pipeline import run_pipeline


@pytest.mark.slow
def test_vanilla_geodesic_pipeline(tmp_path):
    exp = str(tmp_path / "exp")
    arch = {"enc_channels": [8, 16, 32], "dec_channels": [32, 16, 8],
            "latent_dim": 8}
    tf_model = {"num_tokens": 25, "embed_dim": 32, "n_layers": 2, "n_head": 2}
    ov = {
        "vae": {"max_epochs": 2, "early_stop": 0, "kl_anneal_epochs": 2,
                "out_dir": f"{exp}/vae",
                "data": {"synthetic_size": 384, "batch_size": 64},
                "model": arch},
        "codebook": {"latents_path": f"{exp}/vae/latents_train",
                     "vae_ckpt_path": f"{exp}/vae/checkpoints/best",
                     "out_dir": f"{exp}/codebook",
                     "vae": arch,
                     "graph": {"k": 6},
                     "quantize": {"K": 24},
                     "riemannian": {"mode": "subset", "max_edges": 400,
                                    "batch_size": 256}},
        "transformer": {"data": {"codes_path": f"{exp}/codebook/codes.npy",
                                 "labels_path": f"{exp}/vae/latents_train",
                                 "batch_size": 64},
                        "training": {"epochs": 2},
                        "out": {"dir": f"{exp}/transformer"},
                        "model": tf_model},
        "generate": {"transformer_ckpt_path": f"{exp}/transformer/checkpoints/best",
                     "vae_ckpt_path": f"{exp}/vae/checkpoints/best",
                     "codebook_path": f"{exp}/codebook/codebook.npz",
                     "transformer": tf_model, "vae": arch,
                     "num_samples": 20, "samples_per_class": 2, "top_k": 10,
                     "output_dir": f"{exp}/evaluation"},
        "evaluate": {"generated_path": f"{exp}/evaluation/generated_samples.png",
                     "num_samples": 20, "samples_per_class": 2,
                     "out_dir": f"{exp}/evaluation",
                     "data": {"dataset_name": "fashionmnist",
                              "synthetic_size": 128}},
    }
    run_pipeline("configs/fashionmnist/vanilla/geodesic", overrides=ov)
    exp = Path(exp)
    # riemannian legacy builder saves BOTH graphs
    assert (exp / "codebook/knn_graph.npz").exists()
    assert (exp / "codebook/knn_graph_riemannian.npz").exists()
    codes = np.load(exp / "codebook/codes.npy")
    assert codes.ndim == 1  # one code per image
    assert codes.max() < 24
    metrics = yaml.safe_load(open(exp / "evaluation/metrics.yaml"))
    assert "PSNR" in metrics
