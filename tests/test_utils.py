"""Utils-layer tests: config, checkpointing, codebook IO, images."""
import numpy as np
import pytest

from vqvae_tpu.config import Config, load_config, save_config
from vqvae_tpu.utils.checkpoint import Checkpointer, auto_detect_vae_config
from vqvae_tpu.utils.images import make_grid, save_image_grid, load_image
from vqvae_tpu.cli.build_codebook import save_codebook_artifacts, load_codebook


def test_config_access_and_merge(tmp_path):
    save_config({"a": 1, "b": {"c": 2}}, tmp_path / "c.yaml")
    cfg = load_config(tmp_path / "c.yaml", overrides={"b": {"d": 3}})
    assert cfg.a == 1 and cfg.b.c == 2 and cfg.b.d == 3
    assert cfg.get("missing", "x") == "x"
    with pytest.raises(AttributeError):
        _ = cfg.nope
    cfg2 = cfg.replace(a=9)
    assert cfg2.a == 9 and cfg.a == 1


def test_checkpointer_best_latest_roundtrip(tmp_path):
    ck = Checkpointer(tmp_path)
    state = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
             "step": 5}
    ck.save("best", state)
    ck.save("latest", {**state, "step": 9})
    assert ck.exists("best") and ck.exists("latest")
    r = ck.restore("best")
    np.testing.assert_array_equal(r["params"]["w"], state["params"]["w"])
    assert int(ck.restore("latest")["step"]) == 9
    # overwrite best
    ck.save("best", {**state, "step": 7})
    assert int(ck.restore("best")["step"]) == 7
    with pytest.raises(FileNotFoundError):
        ck.restore("nope")


def test_checkpointer_saved_keys_probe(tmp_path):
    """Format probing for the resume path: full-state vs weights-only
    checkpoints must be distinguishable WITHOUT a trial restore."""
    ck = Checkpointer(tmp_path)
    ck.save("latest", {"params": {"w": np.ones(3, np.float32)},
                       "opt_state": {"mu": np.zeros(3, np.float32)},
                       "step": 1, "epoch": 2})
    assert {"params", "opt_state", "step", "epoch"} <= ck.saved_keys("latest")
    ck.save("latest", {"params": {"w": np.ones(3, np.float32)},
                       "step": 1, "epoch": 2})
    keys = ck.saved_keys("latest")
    assert "opt_state" not in keys and "params" in keys


def test_auto_detect_vae_config():
    import jax

    from vqvae_tpu.models import VAE

    m = VAE(in_channels=3, latent_dim=7, topology="spatial",
            output_image_size=32, norm_type="batch",
            enc_channels=(8, 16, 32), dec_channels=(32, 16, 8))
    v = m.init({"params": jax.random.key(0)},
               np.zeros((1, 32, 32, 3), np.float32))
    cfg = auto_detect_vae_config(v["params"])
    assert cfg["in_channels"] == 3
    assert cfg["enc_channels"] == (8, 16, 32)
    assert cfg["dec_channels"] == (32, 16, 8)
    assert cfg["latent_dim"] == 7
    assert cfg["topology"] == "spatial"
    assert cfg["norm_type"] == "batch"
    assert cfg["output_image_size"] == 32


def test_codebook_npz_and_pt_roundtrip(tmp_path):
    medoids = np.asarray([3, 1, 4], np.int64)
    z_medoid = np.random.RandomState(0).randn(3, 8).astype(np.float32)
    codes = np.random.RandomState(1).randint(-1, 3, (5, 4, 4)).astype(np.int32)
    save_codebook_artifacts(tmp_path, medoids, z_medoid, codes, {"K": 3})

    for name in ["codebook.npz", "codebook.pt"]:
        cb = load_codebook(tmp_path / name)
        np.testing.assert_array_equal(cb["medoid_indices"], medoids)
        np.testing.assert_allclose(cb["z_medoid"], z_medoid, atol=1e-6)
        assert cb["config"]["K"] == 3
    np.testing.assert_array_equal(np.load(tmp_path / "codes.npy"), codes)


def test_image_grid_roundtrip(tmp_path):
    imgs = np.random.RandomState(0).rand(5, 8, 8, 1).astype(np.float32)
    grid = make_grid(imgs, nrow=3, padding=1)
    assert grid.shape == (2 * 9 + 1, 3 * 9 + 1, 1)
    p = save_image_grid(imgs, tmp_path / "g.png", nrow=3, padding=1)
    loaded = load_image(p)
    assert loaded.shape == grid.shape
    np.testing.assert_allclose(loaded, grid, atol=2 / 255)


def test_make_results_table(tmp_path):
    """tools/make_results_table renders the appendix-style tables
    (reference template/appendix.md:100-113)."""
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import make_results_table as mrt

    for method, psnr in (("a/geo", 30.0), ("b/euc", 33.42)):
        ev = tmp_path / method / "evaluation"
        ev.mkdir(parents=True)
        (ev / "metrics.yaml").write_text(
            f"PSNR: '{psnr}'\nSSIM: '0.95'\nLPIPS: null\n")
        (ev / "comparison_grid.png").write_bytes(b"png")
        (ev / "quantization_analysis.json").write_text(json.dumps({
            "psnr_real_vs_continuous": 12.0, "psnr_real_vs_quantized": 11.9,
            "psnr_continuous_vs_quantized": 30.0,
            "ssim_real_vs_continuous": 0.5, "ssim_real_vs_quantized": 0.49,
            "ssim_continuous_vs_quantized": 0.9}))
    doc = mrt.render(mrt.collect(tmp_path), tmp_path)
    assert "**33.42**" in doc      # best PSNR bolded
    assert "| a/geo | 30.00" in doc
    assert "Table 2" in doc and "Figure 1" in doc
    out = tmp_path / "results.md"
    mrt.main(["--root", str(tmp_path), "--out", str(out)])
    assert out.read_text() == doc

    # latex renderer (paper/main.tex \input): balanced envs, best bolded
    tex = mrt.render_latex(mrt.collect(tmp_path), tmp_path)
    assert r"\textbf{33.42}" in tex
    assert tex.count(r"\begin{table}") == tex.count(r"\end{table}") == 2
    assert tex.count(r"\begin{tabular}") == tex.count(r"\end{tabular}")
    assert r"\begin{figure}" in tex and r"\end{figure}" in tex
    assert "a/geo" in tex and "&" in tex


def test_unnormalize_images_display_mapping():
    """The round-5 CIFAR display fix: a raw-logit-MSE CIFAR decoder emits
    into mean/std-normalized space, so display must be x*std+mean — NOT
    sigmoid (the reference hard-applies sigmoid in generate_samples.py:97,
    which floors its own CIFAR SSIM; docs/runs/
    cifar10-spatial-geodesic-rootcause.md)."""
    from vqvae_tpu.data.datasets import CIFAR10_MEAN, CIFAR10_STD
    from vqvae_tpu.utils.images import unnormalize_images

    rng = np.random.default_rng(0)
    img = rng.uniform(0.05, 0.95, size=(2, 4, 4, 3)).astype(np.float32)

    # CIFAR raw-logit path: normalized-space prediction round-trips to [0,1]
    normalized = (img - CIFAR10_MEAN) / CIFAR10_STD
    out = unnormalize_images(normalized, "cifar10", apply_sigmoid=False)
    np.testing.assert_allclose(out, img, rtol=1e-5, atol=1e-5)
    assert out.min() >= 0.0 and out.max() <= 1.0

    # a sigmoid mapping of the same prediction CANNOT recover the image
    # (this is exactly the recorded SSIM=1.5e-06 failure mode)
    sig = unnormalize_images(normalized, "cifar10", apply_sigmoid=True)
    assert np.abs(sig - img).max() > 0.1

    # sigmoided models map through sigmoid regardless of dataset
    logits = np.array([[-20.0, 0.0, 20.0]], np.float32).reshape(1, 1, 3, 1)
    out = unnormalize_images(logits, "fashionmnist", apply_sigmoid=True)
    np.testing.assert_allclose(out.ravel(), [0.0, 0.5, 1.0], atol=1e-6)

    # raw [0,1]-space models just clip
    raw = np.array([[-0.2, 0.4, 1.3]], np.float32).reshape(1, 1, 3, 1)
    out = unnormalize_images(raw, "fashionmnist", apply_sigmoid=False)
    np.testing.assert_allclose(out.ravel(), [0.0, 0.4, 1.0], atol=1e-6)
