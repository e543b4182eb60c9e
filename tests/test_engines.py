"""End-to-end engine smoke tests on tiny synthetic data (8-dev CPU mesh)."""
from pathlib import Path

import jax
import numpy as np
import pytest

from vqvae_tpu.data import get_data_loaders
from vqvae_tpu.data.codes import CodeLoader
from vqvae_tpu.models import VAE, Transformer, VQVAE
from vqvae_tpu.train import VAEEngine, TransformerEngine, VQVAEEngine
from vqvae_tpu.train.transformer_engine import sample_autoregressive
from vqvae_tpu.utils.latents import load_latents


@pytest.fixture(scope="module")
def tiny_loaders():
    return get_data_loaders("FashionMNIST", batch_size=64, synthetic_size=256, seed=0)


def test_vae_engine_spatial_trains(tmp_path, tiny_loaders):
    train_loader, val_loader = tiny_loaders
    model = VAE(in_channels=1, latent_dim=4, topology="spatial",
                output_image_size=28, norm_type="batch", recon_loss="mse",
                enc_channels=(8, 16, 32), dec_channels=(32, 16, 8))
    engine = VAEEngine(model, lr=1e-3, weight_decay=1e-5,
                       grad_clip_max_norm=1.0, cosine_t_max=3,
                       steps_per_epoch=len(train_loader), seed=0)
    state = engine.init_state(train_loader.split.images[:1])
    out = tmp_path / "vae"
    state = engine.train(state, train_loader, val_loader, num_epochs=3,
                         early_stop=0, checkpoint_dir=out / "ckpt",
                         output_dir=out, save_latents_flag=True,
                         kl_anneal_epochs=2, beta=1.0)
    assert (out / "ckpt" / "best").exists()
    assert (out / "ckpt" / "latest").exists()
    assert (out / "recon_grid.png").exists()
    lat = load_latents(out / "latents_train")
    assert lat["z"].shape == (256, 4, 4, 4)
    assert lat["y"].shape == (256,)


def test_vae_engine_flat_trains(tmp_path, tiny_loaders):
    train_loader, val_loader = tiny_loaders
    model = VAE(in_channels=1, latent_dim=8, topology="flat",
                output_image_size=28, norm_type="none", recon_loss="bce",
                enc_channels=(8, 16, 32), dec_channels=(32, 16, 8))
    engine = VAEEngine(model, lr=1e-3, seed=0)
    state = engine.init_state(train_loader.split.images[:1])
    s1 = engine.run_epoch(state, train_loader, True, 1, 1.0, jax.random.key(0))
    state2, m1 = s1
    _, m5 = engine.run_epoch(state2, train_loader, True, 2, 1.0, jax.random.key(1))
    assert m5["loss"] < m1["loss"]  # loss decreases


def test_transformer_engine_and_sampling(tmp_path):
    rng = np.random.default_rng(0)
    n, seq = 128, 16
    codes = rng.integers(0, 32, size=(n, seq)).astype(np.int32)
    labels = rng.integers(0, 10, size=n).astype(np.int32)
    loader = CodeLoader(codes[:, :-1], codes[:, 1:], labels, batch_size=32,
                        shuffle=True)
    model = Transformer(num_classes=10, num_tokens=32, embed_dim=32,
                        n_layers=2, n_head=2, max_seq_len=seq, dropout=0.0)
    engine = TransformerEngine(model, lr=3e-4, cosine_t_max=2,
                               steps_per_epoch=len(loader), seed=0)
    state = engine.init_state(seq_len=seq - 1)
    state = engine.train(state, loader, loader, num_epochs=2,
                         checkpoint_dir=tmp_path / "tf")
    assert (tmp_path / "tf" / "best").exists()

    first = np.zeros((5, 1), np.int32)
    y = np.arange(5, dtype=np.int32)
    out = sample_autoregressive(model, state.params, first, steps=seq - 1,
                                rng=jax.random.key(0), temperature=1.0,
                                top_k=8, labels=y)
    out = np.asarray(out)
    assert out.shape == (5, seq)
    assert ((out >= 0) & (out < 32)).all()


def test_sampling_kv_cache_matches_full_forward():
    """Greedy decoding with the KV cache must match full-prefix forward."""
    import jax.numpy as jnp

    model = Transformer(num_classes=0, num_tokens=16, embed_dim=16,
                        n_layers=2, n_head=2, max_seq_len=8, dropout=0.0)
    x0 = jnp.zeros((2, 8), jnp.int32)
    variables = model.init({"params": jax.random.key(3)}, x0)
    params = variables["params"]

    # full-prefix greedy
    toks = np.zeros((2, 1), np.int32)
    for _ in range(7):
        logits = model.apply({"params": params}, jnp.asarray(toks))
        nxt = np.asarray(logits[:, -1, :].argmax(-1))[:, None]
        toks = np.concatenate([toks, nxt], axis=1)

    # KV-cache greedy = temperature -> 0 via argmax equivalence check:
    # sample with tiny temperature and top_k=1 (deterministic argmax)
    out = sample_autoregressive(model, params,
                                jnp.zeros((2, 1), jnp.int32), steps=7,
                                rng=jax.random.key(0), temperature=1.0,
                                top_k=1)
    np.testing.assert_array_equal(np.asarray(out), toks)


def test_vqvae_engine_trains(tmp_path):
    train_loader, val_loader = get_data_loaders("CIFAR10", batch_size=32,
                                                synthetic_size=96, seed=0)
    model = VQVAE(in_channels=3, z_channels=16, hidden=32, n_res_blocks=1)
    engine = VQVAEEngine(model, n_codes=32, lr=2e-4, seed=0)
    state, cb, bank = engine.init_state(train_loader.split.image_shape)
    state, cb, bank = engine.train(state, cb, bank, train_loader, val_loader,
                                   num_epochs=2, checkpoint_dir=tmp_path / "vq",
                                   output_dir=tmp_path / "vq_out")
    assert (tmp_path / "vq" / "best").exists()
    assert np.isfinite(np.asarray(cb.embed)).all()


def test_vae_engine_bf16_compute(tiny_loaders):
    """bf16 compute dtype (config `model.dtype: bfloat16`, the AMP
    replacement): params stay f32, a train epoch runs finite."""
    import jax.numpy as jnp

    train_loader, _ = tiny_loaders
    model = VAE(in_channels=1, latent_dim=4, topology="spatial",
                output_image_size=28, norm_type="batch", recon_loss="mse",
                enc_channels=(8, 16, 32), dec_channels=(32, 16, 8),
                dtype=jnp.bfloat16)
    engine = VAEEngine(model, lr=1e-3, seed=0)
    state = engine.init_state(train_loader.split.images[:1])
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(p.dtype == jnp.float32 for p in leaves)
    _, m = engine.run_epoch(state, train_loader, True, 1, 1.0,
                            jax.random.key(0))
    assert np.isfinite(m["loss"])
