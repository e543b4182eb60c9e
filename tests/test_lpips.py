"""LPIPS module tests with synthetic weights (real weights unavailable in
this zero-egress environment; these verify the plumbing + invariances)."""
import numpy as np
import pytest

from vqvae_tpu.eval.lpips import _ALEX, lpips_distance


@pytest.fixture
def synth_weights(tmp_path):
    rng = np.random.RandomState(0)
    w = {}
    cin = 3
    for i, (cout, k, s, p, _) in enumerate(_ALEX):
        w[f"conv{i}/kernel"] = rng.randn(cout, cin, k, k).astype(np.float32) * 0.05
        w[f"conv{i}/bias"] = np.zeros(cout, np.float32)
        w[f"lin{i}"] = np.abs(rng.randn(cout)).astype(np.float32) * 0.01
        cin = cout
    path = tmp_path / "weights.npz"
    np.savez(path, **w)
    return path


def test_zero_for_identical(synth_weights):
    x = np.random.RandomState(1).rand(4, 28, 28, 3).astype(np.float32)
    d = lpips_distance(x, x, weights_path=synth_weights)
    assert abs(d) < 1e-6


def test_positive_for_different(synth_weights):
    rng = np.random.RandomState(2)
    x = rng.rand(4, 28, 28, 3).astype(np.float32)
    y = rng.rand(4, 28, 28, 3).astype(np.float32)
    d = lpips_distance(x, y, weights_path=synth_weights)
    assert d > 0


def test_monotone_in_noise(synth_weights):
    rng = np.random.RandomState(3)
    x = rng.rand(4, 28, 28, 3).astype(np.float32)
    small = np.clip(x + rng.normal(0, 0.02, x.shape), 0, 1).astype(np.float32)
    big = np.clip(x + rng.normal(0, 0.3, x.shape), 0, 1).astype(np.float32)
    d_small = lpips_distance(x, small, weights_path=synth_weights)
    d_big = lpips_distance(x, big, weights_path=synth_weights)
    assert d_small < d_big


def test_missing_weights_raises(tmp_path, monkeypatch):
    monkeypatch.delenv("LPIPS_WEIGHTS", raising=False)
    monkeypatch.chdir(tmp_path)  # no data/lpips_alex.npz here
    with pytest.raises(FileNotFoundError):
        lpips_distance(np.zeros((1, 8, 8, 3), np.float32),
                       np.zeros((1, 8, 8, 3), np.float32))
