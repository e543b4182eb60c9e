"""Transformer-prior training engine.

Parity with the reference loop (reference src/scripts/train_transformer.py:
16-87): AdamW + per-epoch cosine schedule, next-token cross entropy,
best-on-val / latest checkpoints. Differences by design:

- one jitted data-parallel train step over the mesh (batch-axis sharding),
- ``label_smoothing`` is actually consumed (the reference declares it in
  config but never reads it — SURVEY.md §5 "known dead knob"),
- checkpoints carry the full train state (the reference saves a raw
  state_dict asymmetric with its VAE checkpoints; here all stages share
  one Orbax format).

Sampling (temperature + top-k, class-conditional) lives here too, using a
KV cache over a ``lax.scan`` — the reference re-runs the full prefix per
step (generate_samples.py:23-31).
"""
from __future__ import annotations

import functools
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.transformer import Transformer, cross_entropy_loss
from ..parallel import get_mesh, shard_batch, replicated_sharding
from ..train.state import TrainState, make_optimizer
from ..utils.checkpoint import Checkpointer


class TransformerEngine:
    def __init__(
        self,
        model: Transformer,
        lr: float,
        weight_decay: float = 0.0,
        grad_clip_max_norm: float = 0.0,
        cosine_t_max: Optional[int] = None,
        steps_per_epoch: int = 1,
        label_smoothing: float = 0.0,
        mesh=None,
        seed: int = 0,
    ):
        self.model = model
        self.mesh = mesh if mesh is not None else get_mesh()
        self.seed = seed
        self.label_smoothing = float(label_smoothing)
        self.tx = make_optimizer(lr, weight_decay, "adamw", grad_clip_max_norm,
                                 cosine_t_max, steps_per_epoch)
        self._train_step = self._build_step(train=True)
        self._eval_step = self._build_step(train=False)

    def init_state(self, seq_len: int, batch_size: int = 2) -> TrainState:
        rng = jax.random.key(self.seed)
        x = jnp.zeros((batch_size, seq_len), jnp.int32)
        y = jnp.zeros((batch_size,), jnp.int32) if self.model.num_classes > 0 else None
        # param init jitted on the LOCAL CPU backend (remote TPU compiles
        # cost 100-300s for a millisecond host computation)
        from ..parallel import run_on_cpu

        variables = run_on_cpu(
            lambda r, xb: self.model.init({"params": r}, xb, y=y), rng, x)
        state = TrainState.create(apply_fn=self.model.apply,
                                  params=variables["params"], tx=self.tx,
                                  batch_stats={})
        return jax.device_put(state, replicated_sharding(self.mesh))

    def _build_step(self, train: bool):
        model = self.model
        ls = self.label_smoothing

        @jax.jit
        def step(state: TrainState, x, targets, labels, mask, rng):
            def loss_fn(params):
                logits = model.apply(
                    {"params": params}, x,
                    y=labels if model.num_classes > 0 else None,
                    train=train,
                    rngs={"dropout": rng} if train else None)
                return cross_entropy_loss(logits, targets, mask=mask,
                                          label_smoothing=ls)

            if train:
                loss, grads = jax.value_and_grad(loss_fn)(state.params)
                state = state.apply_gradients(grads=grads)
            else:
                loss = loss_fn(state.params)
            return state, loss

        return step

    # -- device-resident epoch path (one dispatch per epoch) -----------------
    def _build_epoch_fns(self, batch_size: int):
        model, ls = self.model, self.label_smoothing
        from ..parallel import data_sharding

        shard2 = data_sharding(self.mesh, 2)
        shard1 = data_sharding(self.mesh, 1)

        def take_sharded(a, ib, shard):
            # re-shard each gathered batch across the mesh (data parallel)
            return jax.lax.with_sharding_constraint(jnp.take(a, ib, 0), shard)

        def loss_of(params, x, targets, labels, mask, rng, train):
            logits = model.apply(
                {"params": params}, x,
                y=labels if model.num_classes > 0 else None,
                train=train,
                rngs={"dropout": rng} if train else None)
            return cross_entropy_loss(logits, targets, mask=mask,
                                      label_smoothing=ls)

        @functools.partial(jax.jit, static_argnames=("n_steps",),
                           donate_argnums=(0,))
        def train_epoch(state, x, y, lab, mask, perm, rng, n_steps):
            idx = perm[:n_steps * batch_size].reshape(n_steps, batch_size)

            def body(state, ib):
                step_rng = jax.random.fold_in(rng, state.step)
                loss, grads = jax.value_and_grad(loss_of)(
                    state.params, take_sharded(x, ib, shard2),
                    take_sharded(y, ib, shard2), take_sharded(lab, ib, shard1),
                    take_sharded(mask, ib, shard1), step_rng, True)
                return state.apply_gradients(grads=grads), loss

            state, losses = jax.lax.scan(body, state, idx)
            return state, losses.mean()

        @functools.partial(jax.jit, static_argnames=("n_steps",))
        def eval_epoch(state, x, y, lab, mask, rng, n_steps):
            idx = jnp.arange(n_steps * batch_size).reshape(n_steps, batch_size)

            def body(carry, ib):
                loss = loss_of(state.params, take_sharded(x, ib, shard2),
                               take_sharded(y, ib, shard2),
                               take_sharded(lab, ib, shard1),
                               take_sharded(mask, ib, shard1), rng, False)
                return carry, loss

            _, losses = jax.lax.scan(body, None, idx)
            return losses.mean()

        return train_epoch, eval_epoch

    def _device_dataset(self, loader):
        bs = loader.batch_size
        x, y = loader.x, loader.y
        lab = loader.labels if loader.labels is not None else np.zeros(len(x), np.int32)
        n = len(x)
        n_steps = max(1, (n + bs - 1) // bs)
        n_pad = n_steps * bs
        mask = np.zeros(n_pad, np.float32)
        mask[:n] = 1.0

        def pad(a):
            if n_pad > n:
                a = np.concatenate([a, np.zeros((n_pad - n, *a.shape[1:]),
                                                a.dtype)])
            return a

        rep = replicated_sharding(self.mesh)
        put = lambda a: jax.device_put(jnp.asarray(a), rep)  # noqa: E731
        return (put(pad(x.astype(np.int32))), put(pad(y.astype(np.int32))),
                put(pad(np.asarray(lab, np.int32))), put(mask),
                n_steps, n_pad)

    def run_epoch(self, state, loader, train: bool, epoch: int, rng
                  ) -> Tuple[TrainState, float]:
        # device-side loss accumulation: one host sync per epoch, not per step
        total = None
        n = 0
        for i, (x, y, lab, mask) in enumerate(loader.epoch(epoch)):
            batch = shard_batch(self.mesh, (jnp.asarray(x), jnp.asarray(y),
                                            jnp.asarray(lab), jnp.asarray(mask)))
            state, loss = (self._train_step if train else self._eval_step)(
                state, *batch, jax.random.fold_in(rng, i))
            total = loss if total is None else total + loss
            n += 1
        return state, (float(total) / max(n, 1)) if total is not None else 0.0

    def train(
        self,
        state: TrainState,
        train_loader,
        val_loader,
        num_epochs: int,
        checkpoint_dir: Optional[Path] = None,
        logger=None,
    ) -> TrainState:
        ckptr = Checkpointer(checkpoint_dir) if checkpoint_dir else None
        rng = jax.random.key(self.seed + 1)
        best_val = float("inf")
        best_dev = None
        best_epoch = 0
        # device-side best snapshot: one jitted copy (~free) per
        # improvement instead of a device_get that pulls params+opt_state
        # through the tunnel (~4s x nearly-every-epoch improvements — this
        # alone was most of a 200-epoch stage's wall-clock)
        snapshot = jax.jit(lambda p, o: jax.tree_util.tree_map(
            jnp.copy, (p, o)))

        bs = train_loader.batch_size
        train_epoch_fn, eval_epoch_fn = self._build_epoch_fns(bs)
        x, y, lab, mask, n_steps, n_pad = self._device_dataset(train_loader)

        import time as _time

        save_stride, write_est, last_write = 1, 0.0, 0
        for epoch in range(1, num_epochs + 1):
            t_ep = _time.perf_counter()
            ep_rng = jax.random.fold_in(rng, epoch)
            perm = jax.random.permutation(jax.random.fold_in(ep_rng, 0), n_pad)
            state, tr_loss = train_epoch_fn(state, x, y, lab, mask, perm,
                                            ep_rng, n_steps=n_steps)
            # the "val" loader re-serves the train data unshuffled (reference
            # src/data/__init__.py:50-52); evaluate on the same device arrays
            va_loss = eval_epoch_fn(state, x, y, lab, mask, ep_rng,
                                    n_steps=n_steps)
            tr_loss, va_loss = float(tr_loss), float(va_loss)
            print(f"[transformer] epoch {epoch}/{num_epochs} "
                  f"train={tr_loss:.4f} val={va_loss:.4f} "
                  f"({_time.perf_counter() - t_ep:.1f}s)")
            if logger is not None:
                logger.log_metrics({"train_loss": tr_loss, "val_loss": va_loss},
                                   step=epoch)
            if va_loss < best_val:
                best_val = va_loss
                best_dev = snapshot(state.params, state.opt_state)
                best_epoch = epoch
                best_step = int(state.step)  # scalar sync, 4 bytes
            # every epoch, matching the reference's crash-resume granularity
            # AND contents — weights only, no optimizer (reference
            # train_transformer.py:86-87 saves model.state_dict()); async so
            # the write overlaps the next epoch. Full-state (with optimizer)
            # latest is written once after the loop: a completed stage
            # resumes exactly, a mid-crash resumes weights like the
            # reference. Full-state per epoch measured ~10 s/epoch (300 MB).
            # adaptive cadence: when one latest write (device->host pull
            # over the tunnel + orbax serialize) costs more than an epoch,
            # per-epoch saving would spend most of the stage checkpointing
            # (measured: 0.4s epochs vs ~3.7s writes at the CIFAR shape) —
            # so checkpoint at the rate the hardware sustains instead.
            dt_epoch = _time.perf_counter() - t_ep
            if ckptr and (epoch - last_write >= save_stride
                          or epoch == num_epochs):
                t_ck = _time.perf_counter()
                ckptr.save_async("latest", {"params": state.params,
                                            "step": int(state.step),
                                            "epoch": epoch})
                last_write = epoch
                dt_ck = _time.perf_counter() - t_ck
                write_est = max(dt_ck, 0.7 * write_est)
                save_stride = max(1, min(
                    25, int(write_est / max(dt_epoch, 1e-3))))
        if ckptr and best_dev is not None:
            best_p, best_o = jax.device_get(best_dev)  # one pull at the end
            ckptr.save("best", {"params": best_p, "opt_state": best_o,
                                "step": best_step, "epoch": best_epoch})
        if ckptr:
            ckptr.save("latest", {"params": state.params,
                                  "opt_state": state.opt_state,
                                  "step": int(state.step),
                                  "epoch": num_epochs})
        return state


def sample_autoregressive(
    model: Transformer,
    params,
    first_tokens: jax.Array,  # (B, T0) prompt
    steps: int,
    rng: jax.Array,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    labels: Optional[jax.Array] = None,
) -> jax.Array:
    """KV-cached AR sampling with temperature + top-k filtering
    (reference generate_samples.py:12-31 semantics, minus the O(T^2)
    full-prefix recompute). The whole sample — cache init, prompt priming
    and the generation scan — is ONE jitted program."""
    return _sample_jit(model, params, jnp.asarray(first_tokens), int(steps),
                       rng, float(temperature),
                       None if top_k is None else int(top_k), labels)


@functools.partial(jax.jit, static_argnames=("model", "steps", "temperature",
                                             "top_k"))
def _sample_jit(model, params, first_tokens, steps, rng, temperature,
                top_k, labels) -> jax.Array:
    b, t0 = first_tokens.shape

    cache = model.init_cache(b)

    # prime the cache with the prompt, one token at a time
    def prime(carry, i):
        cache, last_logits = carry
        tok = jax.lax.dynamic_slice_in_dim(first_tokens, i, 1, axis=1)
        logits, mut = model.apply({"params": params, "cache": cache}, tok,
                                  y=labels, decode=True, decode_index=i,
                                  mutable=["cache"])
        return (mut["cache"], logits[:, 0, :]), None

    (cache, last_logits), _ = jax.lax.scan(
        prime, (cache, jnp.zeros((b, model.num_tokens), jnp.float32)),
        jnp.arange(t0))

    def step(carry, i):
        cache, logits, rng = carry
        rng, sub = jax.random.split(rng)
        scaled = logits / temperature
        if top_k is not None:
            kth = jax.lax.top_k(scaled, top_k)[0][:, -1]
            scaled = jnp.where(scaled < kth[:, None], -jnp.inf, scaled)
        tok = jax.random.categorical(sub, scaled)[:, None]  # (B, 1)
        new_logits, mut = model.apply({"params": params, "cache": cache}, tok,
                                      y=labels, decode=True,
                                      decode_index=t0 + i,
                                      mutable=["cache"])
        return (mut["cache"], new_logits[:, 0, :], rng), tok[:, 0]

    (_, _, _), toks = jax.lax.scan(step, (cache, last_logits, rng),
                                   jnp.arange(steps))
    return jnp.concatenate([first_tokens, toks.T], axis=1)  # (B, T0+steps)
