"""End-to-end EMA VQ-VAE baseline trainer.

Parity with the reference baseline loop (reference baseline VQVAE/
vqvae_cifar10_clean/train.py:27-227): images in [-1, 1], L1 reconstruction
+ beta-commitment loss, EMA codebook updates, per-epoch metrics
(loss/rec/vq/q_mse/perplexity/usage/dead + embed norms), a rolling latent
sample bank feeding end-of-epoch dead-code reseeding, NaN-guarded steps,
and best/last checkpoints.

TPU redesign: the whole step — forward, straight-through quantization,
grads, Adam update AND the EMA codebook update — is one jitted function
with the codebook as functional state (models/vqvae_baseline.py). Mixed
precision is bf16 compute by default (the reference's AMP+GradScaler has
no TPU analog; bf16 needs no loss scaling). The NaN guard becomes a
``jnp.where`` on the loss (skip-update semantics without host sync).
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.vqvae_baseline import (
    VQVAE, CodebookState, quantize, ema_update, straight_through,
    commitment_loss, reseed_dead_codes,
)
from ..parallel import get_mesh, shard_batch, replicated_sharding
from ..train.state import TrainState, make_optimizer
from ..utils.checkpoint import Checkpointer
from ..utils.images import save_image_grid


class VQVAEEngine:
    def __init__(
        self,
        model: VQVAE,
        n_codes: int = 512,
        beta: float = 0.25,
        ema_decay: float = 0.99,
        ema_eps: float = 1e-5,
        lr: float = 2e-4,
        weight_decay: float = 0.0,
        grad_clip: float = 1.0,
        bank_size: int = 8192,
        mesh=None,
        seed: int = 0,
    ):
        self.model = model
        self.n_codes = n_codes
        self.beta = beta
        self.ema_decay = ema_decay
        self.ema_eps = ema_eps
        self.bank_size = bank_size
        self.mesh = mesh if mesh is not None else get_mesh()
        self.seed = seed
        self.tx = make_optimizer(lr, weight_decay, "adam", grad_clip)
        self._train_step = self._build_step(train=True)
        self._eval_step = self._build_step(train=False)

    def init_state(self, image_shape) -> Tuple[TrainState, CodebookState, jax.Array]:
        rng = jax.random.key(self.seed)
        k1, k2 = jax.random.split(rng)
        x = jnp.zeros((1, *image_shape), jnp.float32)
        # param init jitted on the LOCAL CPU backend (remote TPU compiles
        # cost 100-300s for a millisecond host computation)
        from ..parallel import run_on_cpu

        variables = run_on_cpu(
            lambda r, xb: self.model.init({"params": r}, xb), k1, x)
        state = TrainState.create(apply_fn=self.model.apply,
                                  params=variables["params"], tx=self.tx,
                                  batch_stats={})
        cb = CodebookState.create(k2, self.n_codes, self.model.z_channels)
        bank = jnp.zeros((self.bank_size, self.model.z_channels), jnp.float32)
        rep = replicated_sharding(self.mesh)
        return (jax.device_put(state, rep), jax.device_put(cb, rep),
                jax.device_put(bank, rep))

    def _build_step(self, train: bool):
        model, beta = self.model, self.beta
        decay, eps, n_codes = self.ema_decay, self.ema_eps, self.n_codes
        bank_size = self.bank_size

        @jax.jit
        def step(state: TrainState, cb: CodebookState, bank, x, mask, rng):
            def loss_fn(params):
                z_e = model.apply({"params": params}, x, method=model.encode)
                z_q, idx = quantize(cb, z_e)
                z_q_st = straight_through(z_e, z_q)
                x_rec = model.apply({"params": params}, z_q_st,
                                    method=model.decode)
                # masked L1 over valid rows (reference train.py:38)
                per = jnp.abs(x_rec - x).mean(axis=(1, 2, 3))
                rec = (per * mask).sum() / jnp.maximum(mask.sum(), 1.0)
                vq = commitment_loss(z_e, z_q, beta)
                return rec + vq, (rec, vq, z_e, z_q, idx, x_rec)

            (loss, (rec, vq, z_e, z_q, idx, x_rec)), grads = (
                jax.value_and_grad(loss_fn, has_aux=True)(state.params))

            # codebook metrics (reference train.py:52-58)
            q_mse = jnp.mean((z_q - z_e) ** 2)
            hist = jnp.bincount(idx.reshape(-1), length=n_codes).astype(jnp.float32)
            usage = (hist > 0).mean()
            p = hist / jnp.maximum(hist.sum(), 1.0)
            perplex = jnp.exp(-(p * jnp.log(p + 1e-12)).sum())

            metrics = {"loss": loss, "rec": rec, "vq": vq, "q_mse": q_mse,
                       "perplex": perplex, "usage": usage, "dead": 1.0 - usage}
            if not train:
                return state, cb, bank, metrics

            # NaN/Inf guard: zero the update instead of a host-synced skip
            finite = jnp.isfinite(loss)
            grads = jax.tree_util.tree_map(
                lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
            state = state.apply_gradients(grads=grads)

            cb_new = ema_update(cb, z_e, idx, decay, eps)
            cb = jax.tree_util.tree_map(
                lambda new, old: jnp.where(finite, new, old), cb_new, cb)

            # rolling latent bank update: take 256 random latents per step
            flat = z_e.reshape(-1, z_e.shape[-1])
            take = min(256, flat.shape[0], bank_size)
            sel = jax.random.choice(rng, flat.shape[0], (take,), replace=False)
            bank = jnp.roll(bank, -take, axis=0).at[-take:].set(flat[sel])
            return state, cb, bank, metrics

        return step

    # -- device-resident epoch path (one dispatch per epoch) -----------------
    _METRIC_KEYS = ("loss", "rec", "vq", "q_mse", "perplex", "usage", "dead")

    def _device_dataset(self, loader, batch_size: int):
        """Denormalize to [-1,1] ONCE, pad to a step multiple, park on
        device (the per-batch loop re-did the host denorm + transfer every
        epoch: 100-epoch runs paid it 100x)."""
        x = loader.split.denormalize(loader.split.images).astype(np.float32)
        x = x * 2.0 - 1.0
        n = x.shape[0]
        n_steps = max(1, (n + batch_size - 1) // batch_size)
        n_pad = n_steps * batch_size
        mask = np.zeros((n_pad,), np.float32)
        mask[:n] = 1.0
        if n_pad > n:
            x = np.concatenate([x, np.zeros((n_pad - n, *x.shape[1:]),
                                            np.float32)])
        rep = replicated_sharding(self.mesh)
        return (jax.device_put(jnp.asarray(x), rep),
                jax.device_put(jnp.asarray(mask), rep), n_steps, n_pad)

    def _build_epoch_fns(self, batch_size: int):
        import functools

        from ..parallel import data_sharding

        batch_sharding = data_sharding(self.mesh, 4)
        mask_sharding = data_sharding(self.mesh, 1)
        keys = self._METRIC_KEYS
        train_step, eval_step = self._train_step, self._eval_step

        def make_body(step_fn, data, mask_all, rng):
            def body(carry, i_ib):
                state, cb, bank = carry
                i, ib = i_ib
                x = jax.lax.with_sharding_constraint(
                    jnp.take(data, ib, axis=0), batch_sharding)
                mask = jax.lax.with_sharding_constraint(
                    jnp.take(mask_all, ib, axis=0), mask_sharding)
                state, cb, bank, m = step_fn(state, cb, bank, x, mask,
                                             jax.random.fold_in(rng, i))
                bs = mask.sum()
                vec = jnp.stack([m[k] for k in keys]) * bs
                return (state, cb, bank), jnp.concatenate([vec, bs[None]])
            return body

        @functools.partial(jax.jit, static_argnames=("n_steps",),
                           donate_argnums=(0, 1, 2))
        def train_epoch(state, cb, bank, data, mask_all, perm, rng, n_steps):
            idx = perm[:n_steps * batch_size].reshape(n_steps, batch_size)
            (state, cb, bank), ms = jax.lax.scan(
                make_body(train_step, data, mask_all, rng),
                (state, cb, bank), (jnp.arange(n_steps), idx))
            return state, cb, bank, ms.sum(axis=0)

        @functools.partial(jax.jit, static_argnames=("n_steps",))
        def eval_epoch(state, cb, bank, data, mask_all, rng, n_steps):
            idx = jnp.arange(n_steps * batch_size).reshape(n_steps, batch_size)
            (_, _, _), ms = jax.lax.scan(
                make_body(eval_step, data, mask_all, rng),
                (state, cb, bank), (jnp.arange(n_steps), idx))
            return ms.sum(axis=0)

        return train_epoch, eval_epoch

    def _metrics_from_sums(self, sums) -> dict:
        sums = np.asarray(sums)
        n = max(float(sums[-1]), 1.0)
        return {k: float(v) / n
                for k, v in zip(self._METRIC_KEYS, sums[:-1])}

    def run_epoch(self, state, cb, bank, loader, train: bool, epoch: int, rng):
        # device-side accumulation; single host sync per epoch
        acc = None
        n = 0.0
        for i, (images, _, mask) in enumerate(loader.epoch(epoch)):
            x01 = loader.split.denormalize(images)
            x = jnp.asarray(x01, jnp.float32) * 2.0 - 1.0  # [-1, 1]
            x, mask_d = shard_batch(self.mesh, (x, jnp.asarray(mask)))
            step_fn = self._train_step if train else self._eval_step
            state, cb, bank, m = step_fn(state, cb, bank, x, mask_d,
                                         jax.random.fold_in(rng, i))
            bs = float(mask.sum())
            m = {k: v * bs for k, v in m.items()}
            acc = m if acc is None else jax.tree_util.tree_map(jnp.add, acc, m)
            n += bs
        if acc is None:
            return state, cb, bank, {}
        acc = jax.device_get(acc)
        return state, cb, bank, {k: float(v) / max(n, 1.0)
                                 for k, v in acc.items()}

    def train(
        self,
        state, cb, bank,
        train_loader, val_loader,
        num_epochs: int,
        checkpoint_dir: Optional[Path] = None,
        logger=None,
        output_dir: Optional[Path] = None,
        samples_every: int = 1,
        reseed_min_count: float = 5.0,
    ):
        ckptr = Checkpointer(checkpoint_dir) if checkpoint_dir else None
        rng = jax.random.key(self.seed + 1)
        best_loss = float("inf")

        # device-resident fast path: dataset parked on device, one scanned
        # dispatch per epoch (the per-batch loop measured ~70s/epoch at the
        # reference's CIFAR shape — dispatch + per-batch host denorm bound)
        fast = not getattr(train_loader, "augment", False)
        if fast:
            bs = train_loader.batch_size
            train_epoch_fn, eval_epoch_fn = self._build_epoch_fns(bs)
            tr_data, tr_mask, tr_steps, tr_pad = self._device_dataset(
                train_loader, bs)
            va_data, va_mask, va_steps, _ = self._device_dataset(
                val_loader, bs)

        import time as _time

        save_stride, write_est = 1, 0.0
        for ep in range(1, num_epochs + 1):
            t_ep = _time.perf_counter()
            ep_rng = jax.random.fold_in(rng, ep)
            if fast:
                perm = jax.random.permutation(
                    jax.random.fold_in(ep_rng, 0), tr_pad)
                state, cb, bank, tr_sums = train_epoch_fn(
                    state, cb, bank, tr_data, tr_mask, perm, ep_rng,
                    n_steps=tr_steps)
                va_sums = eval_epoch_fn(state, cb, bank, va_data, va_mask,
                                        jax.random.fold_in(ep_rng, 1),
                                        n_steps=va_steps)
                tr = self._metrics_from_sums(tr_sums)
                te = self._metrics_from_sums(va_sums)
            else:
                state, cb, bank, tr = self.run_epoch(
                    state, cb, bank, train_loader, True, ep, ep_rng)
                state, cb, bank, te = self.run_epoch(
                    state, cb, bank, val_loader, False, ep, ep_rng)
            cb, n_reseeded = reseed_dead_codes(
                jax.random.fold_in(ep_rng, 999), cb, bank, reseed_min_count)
            n_reseeded = int(n_reseeded)
            norms = np.linalg.norm(np.asarray(cb.embed), axis=1)
            print(f"[vqvae] epoch {ep}/{num_epochs} train={tr['loss']:.4f} "
                  f"val={te['loss']:.4f} ppl={te['perplex']:.1f} "
                  f"usage={te['usage']:.2f} reseeded={n_reseeded} "
                  f"({_time.perf_counter() - t_ep:.1f}s)")
            if logger is not None:
                row = {f"train_{k}": v for k, v in tr.items()}
                row.update({f"val_{k}": v for k, v in te.items()})
                row.update({"embed_norm_mean": float(norms.mean()),
                            "embed_norm_min": float(norms.min()),
                            "embed_norm_max": float(norms.max()),
                            "reseeded": n_reseeded})
                logger.log_metrics(row, step=ep)
            if output_dir is not None and ep % samples_every == 0:
                self._save_recons(state, cb, val_loader, Path(output_dir), ep)
            full = {"params": state.params, "opt_state": state.opt_state,
                    "codebook": cb._asdict(), "epoch": ep}
            # adaptive latest cadence (see transformer engine): checkpoint
            # at the rate one async write actually sustains, not per epoch
            dt_epoch = _time.perf_counter() - t_ep
            if ckptr and (ep % save_stride == 0 or ep == num_epochs):
                t_ck = _time.perf_counter()
                ckptr.save_async("latest", full)
                write_est = max(_time.perf_counter() - t_ck, 0.7 * write_est)
                save_stride = max(1, min(
                    25, int(write_est / max(dt_epoch, 1e-3))))
            if ckptr and te["loss"] < best_loss:
                best_loss = te["loss"]
                ckptr.save("best", full)
        if ckptr:
            ckptr.flush()
        return state, cb, bank

    def _save_recons(self, state, cb, loader, outdir: Path, epoch: int):
        images, _, _ = next(iter(loader.epoch(0)))
        x01 = loader.split.denormalize(images[:32])
        # per-EPOCH artifact (samples_every), so keep it on device behind a
        # cached jit: one compile, then microseconds per epoch — unlike the
        # truly one-shot init/final-artifact calls that run_on_cpu handles
        if not hasattr(self, "_recon_fn"):
            @jax.jit
            def recon(params, cb, x01):
                x = x01 * 2.0 - 1.0
                z_e = self.model.apply({"params": params}, x,
                                       method=self.model.encode)
                z_q, _ = quantize(cb, z_e)
                x_rec = self.model.apply({"params": params}, z_q,
                                         method=self.model.decode)
                return (x_rec + 1.0) / 2.0  # [-1,1] -> [0,1]

            self._recon_fn = recon
        img = np.asarray(self._recon_fn(state.params, cb,
                                        jnp.asarray(x01, jnp.float32)))
        save_image_grid(img, outdir / f"recon_epoch{epoch:04d}.png", nrow=8)
