"""Unit tests for the baseline EMA-VQ functional ops (CodebookState).

Parity targets: reference baseline VQVAE/vqvae_cifar10_clean/models/
vqvae.py:68-143 (argmin quantize, EMA update with Laplace smoothing and
numeric guards, straight-through, commitment loss, dead-code reseeding).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqvae_tpu.models.vqvae_baseline import (
    CodebookState,
    commitment_loss,
    ema_update,
    perplexity,
    quantize,
    reseed_dead_codes,
    straight_through,
)


def make_cb(embed):
    embed = jnp.asarray(embed, jnp.float32)
    return CodebookState(embed=embed,
                         cluster_size=jnp.zeros((embed.shape[0],), jnp.float32),
                         embed_avg=embed)


def test_quantize_matches_numpy_argmin():
    rng = np.random.RandomState(0)
    embed = rng.randn(16, 8).astype(np.float32)
    z_e = rng.randn(2, 3, 3, 8).astype(np.float32)
    z_q, idx = quantize(make_cb(embed), jnp.asarray(z_e))
    flat = z_e.reshape(-1, 8)
    d = ((flat[:, None] - embed[None]) ** 2).sum(-1)
    expect = d.argmin(1)
    assert np.array_equal(np.asarray(idx).reshape(-1), expect)
    assert np.allclose(np.asarray(z_q).reshape(-1, 8), embed[expect], atol=1e-6)


def test_quantize_exact_match_zero_distance():
    embed = np.eye(4, dtype=np.float32) * 3.0
    z_e = embed[np.array([2, 0, 3, 1])].reshape(1, 2, 2, 4)
    z_q, idx = quantize(make_cb(embed), jnp.asarray(z_e))
    assert np.array_equal(np.asarray(idx).reshape(-1), [2, 0, 3, 1])
    assert np.allclose(np.asarray(z_q), z_e)


def test_ema_update_matches_reference_math():
    decay, eps = 0.9, 1e-5
    rng = np.random.RandomState(1)
    embed = rng.randn(4, 2).astype(np.float32)
    cs0 = rng.rand(4).astype(np.float32)
    avg0 = rng.randn(4, 2).astype(np.float32)
    cb = CodebookState(jnp.asarray(embed), jnp.asarray(cs0), jnp.asarray(avg0))
    z_e = rng.randn(1, 2, 2, 2).astype(np.float32)
    _, idx = quantize(cb, jnp.asarray(z_e))
    new = ema_update(cb, jnp.asarray(z_e), idx, decay=decay, eps=eps)

    # hand-computed reference EMA (vqvae.py:85-107)
    flat = z_e.reshape(-1, 2)
    one_hot = np.eye(4)[np.asarray(idx).reshape(-1)]
    counts = one_hot.sum(0)
    cs = cs0 * decay + counts * (1 - decay)
    avg = avg0 * decay + (one_hot.T @ flat) * (1 - decay)
    n = cs.sum()
    smoothed = (cs + eps) / (n + 4 * eps) * n
    expect = np.clip(avg / np.maximum(smoothed, eps)[:, None], -2.0, 2.0)
    assert np.allclose(np.asarray(new.cluster_size), cs, atol=1e-5)
    assert np.allclose(np.asarray(new.embed), expect, atol=1e-5)


def test_ema_update_guards_clamp_and_nan():
    # huge embed_avg with ~zero cluster size would explode without the
    # Laplace smoothing + clip guard
    cb = CodebookState(embed=jnp.zeros((3, 2)),
                       cluster_size=jnp.zeros((3,)),
                       embed_avg=jnp.full((3, 2), 1e9))
    z_e = jnp.zeros((1, 1, 1, 2))
    idx = jnp.zeros((1, 1, 1), jnp.int32)
    new = ema_update(cb, z_e, idx)
    e = np.asarray(new.embed)
    assert np.isfinite(e).all() and (np.abs(e) <= 2.0).all()


def test_straight_through_value_and_gradient():
    z_e = jnp.asarray([[1.0, 2.0]])
    z_q = jnp.asarray([[5.0, -1.0]])
    out = straight_through(z_e, z_q)
    assert np.allclose(np.asarray(out), np.asarray(z_q))
    # gradient flows to z_e as identity, none to z_q
    g_e = jax.grad(lambda a: straight_through(a, z_q).sum())(z_e)
    g_q = jax.grad(lambda b: straight_through(z_e, b).sum())(z_q)
    assert np.allclose(np.asarray(g_e), 1.0)
    assert np.allclose(np.asarray(g_q), 0.0)


def test_commitment_loss_value_and_gradient_side():
    z_e = jnp.asarray([[1.0, 1.0]])
    z_q = jnp.asarray([[0.0, 3.0]])
    loss = commitment_loss(z_e, z_q, beta=0.5)
    assert np.isclose(float(loss), 0.5 * ((1.0) ** 2 + (2.0) ** 2) / 2)
    # commitment pulls z_e toward (stopped) z_q; no grad through z_q
    g_q = jax.grad(lambda b: commitment_loss(z_e, b, beta=0.5))(z_q)
    assert np.allclose(np.asarray(g_q), 0.0)


def test_reseed_dead_codes_replaces_only_dead():
    cb = CodebookState(embed=jnp.arange(8.0).reshape(4, 2),
                       cluster_size=jnp.asarray([10.0, 0.0, 10.0, 1.0]),
                       embed_avg=jnp.arange(8.0).reshape(4, 2))
    bank = jnp.full((5, 2), 99.0)
    new, n_dead = reseed_dead_codes(jax.random.key(0), cb, bank, min_count=5.0)
    assert int(n_dead) == 2  # codes 1 and 3
    e = np.asarray(new.embed)
    assert np.allclose(e[[0, 2]], np.arange(8.0).reshape(4, 2)[[0, 2]])
    assert np.allclose(e[[1, 3]], 99.0)
    cs = np.asarray(new.cluster_size)
    assert cs[1] == 5.0 and cs[3] == 5.0 and cs[0] == 10.0


def test_reseed_dead_codes_empty_or_mismatched_bank_noop():
    cb = make_cb(np.ones((4, 2), np.float32))
    new, n = reseed_dead_codes(jax.random.key(0), cb,
                               jnp.zeros((0, 2)), min_count=5.0)
    assert int(n) == 0 and np.allclose(np.asarray(new.embed), 1.0)
    new, n = reseed_dead_codes(jax.random.key(0), cb,
                               jnp.zeros((3, 7)), min_count=5.0)
    assert int(n) == 0


@pytest.mark.parametrize("case,expect", [
    ("uniform", 8.0),   # all codes equally used -> ppl = K
    ("single", 1.0),    # one code -> ppl = 1
])
def test_perplexity_extremes(case, expect):
    if case == "uniform":
        idx = jnp.arange(8, dtype=jnp.int32)
    else:
        idx = jnp.zeros((8,), jnp.int32)
    assert np.isclose(float(perplexity(idx, 8)), expect, atol=1e-4)
