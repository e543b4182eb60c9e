"""Fused nearest-code Pallas kernel vs numpy oracle (interpret mode on CPU)."""
import numpy as np

from vqvae_tpu.ops.pallas_assign import nearest_codes


def _oracle(z, cb):
    d2 = ((z[:, None, :] - cb[None, :, :]) ** 2).sum(-1)
    return d2.argmin(1), d2.min(1)


def test_matches_oracle():
    rng = np.random.RandomState(0)
    z = rng.randn(300, 16).astype(np.float32)
    cb = rng.randn(37, 16).astype(np.float32)
    idx, dist = nearest_codes(z, cb)
    ref_idx, ref_d = _oracle(z, cb)
    np.testing.assert_array_equal(idx, ref_idx)
    np.testing.assert_allclose(dist, ref_d, rtol=1e-4, atol=1e-4)


def test_nonmultiple_shapes():
    rng = np.random.RandomState(1)
    z = rng.randn(1037, 5).astype(np.float32)  # ragged N and D
    cb = rng.randn(130, 5).astype(np.float32)  # ragged K
    idx, dist = nearest_codes(z, cb, tile=256)
    ref_idx, ref_d = _oracle(z, cb)
    np.testing.assert_array_equal(idx, ref_idx)
    np.testing.assert_allclose(dist, ref_d, rtol=1e-4, atol=1e-4)


def test_exact_match_distance_zero():
    rng = np.random.RandomState(2)
    cb = rng.randn(16, 8).astype(np.float32)
    z = cb[[3, 7, 3]]
    idx, dist = nearest_codes(z, cb)
    np.testing.assert_array_equal(idx, [3, 7, 3])
    assert (dist < 1e-3).all()


def test_single_code():
    rng = np.random.RandomState(3)
    z = rng.randn(20, 4).astype(np.float32)
    cb = rng.randn(1, 4).astype(np.float32)
    idx, dist = nearest_codes(z, cb)
    assert (idx == 0).all()
