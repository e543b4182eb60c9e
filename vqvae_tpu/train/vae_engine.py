"""Unified VAE training engine (flat and spatial topologies).

Replaces the reference's duplicated engines (reference
src/training/engine.py + spatial_engine.py are ~95% identical; SURVEY.md
§7 explicitly calls for one engine parameterized by latent topology).

TPU-first design:
- one jitted, donated train step (forward + ELBO + grad + optimizer +
  batch-stats update) compiled once for the whole run; padded batches keep
  shapes static,
- data parallelism via a `jax.sharding.Mesh`: batches are device_put with
  batch-axis sharding, params replicated — XLA inserts the grad psum,
- epoch-level beta (KL) annealing and per-step capacity annealing are
  traced scalars (no recompilation),
- val metrics (masked PSNR / global-stats SSIM) computed on device,
- Orbax best/latest checkpoints carry the full train state (the reference
  never restores optimizer state; we do),
- latent extraction is a second jitted sweep, saved as latents.npz.

Matches the reference training semantics: linear beta warmup over
``kl_anneal_epochs`` (engine.py:107), early stop on val loss
(engine.py:138-148), best-on-val / latest checkpoints, per-epoch metric
names (train/val loss, recon, kl, beta, val_psnr, val_ssim,
*_recon_per_pixel — engine.py:120-135), and a recon grid image.
"""
from __future__ import annotations

import functools
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import DataLoader
from ..eval.metrics import psnr, ssim_simple
from ..models.vae import VAE, elbo_loss, reparameterize
from ..parallel import get_mesh, shard_batch, replicated_sharding
from ..train.state import TrainState, make_optimizer
from ..utils.checkpoint import Checkpointer
from ..utils.images import save_image_grid
from ..utils.latents import save_latents


class VAEEngine:
    def __init__(
        self,
        model: VAE,
        lr: float,
        weight_decay: float = 0.0,
        optimizer: str = "adamw",
        grad_clip_max_norm: float = 0.0,
        cosine_t_max: Optional[int] = None,
        steps_per_epoch: int = 1,
        mesh=None,
        seed: int = 0,
    ):
        self.model = model
        self.mesh = mesh if mesh is not None else get_mesh()
        self.seed = seed
        self.tx = make_optimizer(lr, weight_decay, optimizer,
                                 grad_clip_max_norm, cosine_t_max,
                                 steps_per_epoch)
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()

    # -- state ---------------------------------------------------------------
    def init_state(self, sample_images: np.ndarray) -> TrainState:
        from ..parallel import run_on_cpu

        rng = jax.random.key(self.seed)
        # param init runs jitted on the LOCAL CPU backend: eager flax init
        # was one tiny remote compile per op, and a jitted init on the TPU
        # is one big remote compile (100-300s on this platform) for a
        # computation that takes milliseconds on host
        variables = run_on_cpu(
            lambda r, x: self.model.init({"params": r}, x, r, True),
            rng, jnp.asarray(sample_images[:1]))
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        state = TrainState.create(apply_fn=self.model.apply, params=params,
                                  tx=self.tx, batch_stats=batch_stats)
        return jax.device_put(state, replicated_sharding(self.mesh))

    # -- jitted steps ----------------------------------------------------------
    def _variables(self, params, batch_stats):
        v = {"params": params}
        if batch_stats:
            v["batch_stats"] = batch_stats
        return v

    def _build_train_step(self):
        model = self.model

        # NOTE: no buffer donation — `best_state` keeps a live reference to
        # an earlier state's arrays for the post-training latent dump.
        @jax.jit
        def train_step(state: TrainState, images, mask, rng, beta):
            rng = jax.random.fold_in(rng, state.step)

            def loss_fn(params):
                variables = self._variables(params, state.batch_stats)
                if state.batch_stats:
                    (x_logits, mu, logvar, _), new_vars = model.apply(
                        variables, images, rng, True, mutable=["batch_stats"])
                else:
                    x_logits, mu, logvar, _ = model.apply(variables, images,
                                                          rng, True)
                    new_vars = {}
                total, recon, kl = elbo_loss(
                    images, x_logits, mu, logvar,
                    recon_loss=model.recon_loss,
                    mse_use_sigmoid=model.mse_use_sigmoid,
                    topology=model.topology, beta=beta, mask=mask,
                    free_bits=model.free_bits,
                    capacity_max=model.capacity_max,
                    capacity_anneal_steps=model.capacity_anneal_steps,
                    capacity_mode=model.capacity_mode,
                    step=state.step,
                    spatial_free_bits=model.spatial_free_bits)
                return total, (recon, kl, new_vars.get("batch_stats", {}))

            (total, (recon, kl, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            state = state.apply_gradients(grads=grads)
            if new_bs:
                state = state.replace(batch_stats=new_bs)
            return state, {"loss": total, "recon": recon, "kl": kl}

        return train_step

    def _build_eval_step(self):
        model = self.model

        @jax.jit
        def eval_step(state: TrainState, images, mask, rng, beta):
            variables = self._variables(state.params, state.batch_stats)
            x_logits, mu, logvar, _ = model.apply(variables, images, rng, False)
            total, recon, kl = elbo_loss(
                images, x_logits, mu, logvar,
                recon_loss=model.recon_loss,
                mse_use_sigmoid=model.mse_use_sigmoid,
                topology=model.topology, beta=beta, mask=mask,
                free_bits=model.free_bits,
                capacity_max=model.capacity_max,
                capacity_anneal_steps=model.capacity_anneal_steps,
                capacity_mode=model.capacity_mode,
                step=state.step,
                    spatial_free_bits=model.spatial_free_bits)
            x_rec = jax.nn.sigmoid(x_logits) if model.apply_sigmoid else x_logits
            x_rec = jnp.clip(x_rec, 0.0, 1.0)
            return {
                "loss": total, "recon": recon, "kl": kl,
                "psnr": psnr(x_rec, images, mask=mask),
                "ssim": ssim_simple(x_rec, images, mask=mask),
                "n": mask.sum(),
            }

        return eval_step

    # -- device-resident epoch path -------------------------------------------
    def _build_epoch_fns(self, batch_size: int):
        """Whole-epoch train/eval as ONE jitted program: the dataset lives
        on device, a `lax.scan` walks shuffled batch indices, and exactly
        one dispatch crosses the host boundary per epoch. This is the
        TPU-native answer to the reference's per-batch DataLoader loop
        (its 235 steps/epoch each pay host->device + .item() sync)."""
        model = self.model
        from ..parallel import data_sharding

        batch_sharding = data_sharding(self.mesh, 4)
        mask_sharding = data_sharding(self.mesh, 1)

        def one_train_step(state, idx_batch, data, mask_all, rng, beta):
            # the dataset is replicated; re-shard each gathered batch across
            # the mesh so the step runs data-parallel (XLA inserts the grad
            # psum) instead of redundantly on every chip
            images = jax.lax.with_sharding_constraint(
                jnp.take(data, idx_batch, axis=0), batch_sharding)
            mask = jax.lax.with_sharding_constraint(
                jnp.take(mask_all, idx_batch, axis=0), mask_sharding)
            step_rng = jax.random.fold_in(rng, state.step)

            def loss_fn(params):
                variables = self._variables(params, state.batch_stats)
                if state.batch_stats:
                    (x_logits, mu, logvar, _), new_vars = model.apply(
                        variables, images, step_rng, True,
                        mutable=["batch_stats"])
                else:
                    x_logits, mu, logvar, _ = model.apply(variables, images,
                                                          step_rng, True)
                    new_vars = {}
                total, recon, kl = elbo_loss(
                    images, x_logits, mu, logvar,
                    recon_loss=model.recon_loss,
                    mse_use_sigmoid=model.mse_use_sigmoid,
                    topology=model.topology, beta=beta, mask=mask,
                    free_bits=model.free_bits,
                    capacity_max=model.capacity_max,
                    capacity_anneal_steps=model.capacity_anneal_steps,
                    capacity_mode=model.capacity_mode,
                    step=state.step,
                    spatial_free_bits=model.spatial_free_bits)
                return total, (recon, kl, new_vars.get("batch_stats", {}))

            (total, (recon, kl, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            # NaN/Inf guard: zero the update instead of a host-synced skip
            # (the reference baseline skips such steps, train.py:59-61)
            finite = jnp.isfinite(total)
            grads = jax.tree_util.tree_map(
                lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
            state = state.apply_gradients(grads=grads)
            if new_bs:
                state = state.replace(batch_stats=new_bs)
            return state, jnp.stack([total, recon, kl])

        @functools.partial(jax.jit, static_argnames=("n_steps",),
                           donate_argnums=(0,))
        def train_epoch(state, data, mask_all, perm, rng, beta, n_steps):
            idx = perm[:n_steps * batch_size].reshape(n_steps, batch_size)

            def body(state, ib):
                return one_train_step(state, ib, data, mask_all, rng, beta)

            state, metrics = jax.lax.scan(body, state, idx)
            return state, metrics.mean(axis=0)  # (3,) loss/recon/kl

        @functools.partial(jax.jit, static_argnames=("n_steps",))
        def eval_epoch(state, data, mask_all, perm, rng, beta, n_steps):
            idx = perm[:n_steps * batch_size].reshape(n_steps, batch_size)
            variables = self._variables(state.params, state.batch_stats)

            def body(carry, ib):
                images = jax.lax.with_sharding_constraint(
                    jnp.take(data, ib, axis=0), batch_sharding)
                mask = jax.lax.with_sharding_constraint(
                    jnp.take(mask_all, ib, axis=0), mask_sharding)
                x_logits, mu, logvar, _ = model.apply(
                    variables, images, jax.random.fold_in(rng, ib[0]), False)
                total, recon, kl = elbo_loss(
                    images, x_logits, mu, logvar,
                    recon_loss=model.recon_loss,
                    mse_use_sigmoid=model.mse_use_sigmoid,
                    topology=model.topology, beta=beta, mask=mask,
                    free_bits=model.free_bits,
                    capacity_max=model.capacity_max,
                    capacity_anneal_steps=model.capacity_anneal_steps,
                    capacity_mode=model.capacity_mode, step=state.step,
                    spatial_free_bits=model.spatial_free_bits)
                x_rec = (jax.nn.sigmoid(x_logits) if model.apply_sigmoid
                         else x_logits)
                x_rec = jnp.clip(x_rec, 0.0, 1.0)
                n = mask.sum()
                stats = jnp.stack([total, recon, kl,
                                   psnr(x_rec, images, mask=mask) * n,
                                   ssim_simple(x_rec, images, mask=mask) * n,
                                   n])
                return carry, stats

            _, metrics = jax.lax.scan(body, None, idx)
            return metrics.sum(axis=0)  # summed; normalized on host

        return train_epoch, eval_epoch

    def _device_dataset(self, loader: DataLoader, batch_size: int):
        """Pad the split to a step multiple and park it on device (a
        validity mask covers the padding rows)."""
        images = loader.split.images
        n = images.shape[0]
        n_steps = max(1, (n + batch_size - 1) // batch_size)
        n_pad = n_steps * batch_size
        mask = np.zeros((n_pad,), np.float32)
        mask[:n] = 1.0
        if n_pad > n:
            images = np.concatenate(
                [images, np.zeros((n_pad - n, *images.shape[1:]),
                                  images.dtype)])
        sharding = replicated_sharding(self.mesh)
        return (jax.device_put(jnp.asarray(images), sharding),
                jax.device_put(jnp.asarray(mask), sharding),
                n_steps, n_pad)

    # -- loops ----------------------------------------------------------------
    def run_epoch(self, state, loader: DataLoader, train: bool, epoch: int,
                  beta: float, rng) -> Tuple[TrainState, Dict[str, float]]:
        """One epoch. Metric accumulation stays ON DEVICE — syncing scalars
        per step would serialize the async dispatch pipeline (the reference
        pays exactly this cost with its per-step .item() calls,
        engine.py:57-59); we block once at epoch end."""
        acc = None  # device-side running sums
        n_batches = 0
        for images, _, mask in loader.epoch(epoch):
            batch = shard_batch(self.mesh, (jnp.asarray(images), jnp.asarray(mask)))
            images_d, mask_d = batch
            if train:
                state, m = self._train_step(state, images_d, mask_d, rng,
                                            jnp.float32(beta))
            else:
                m = self._eval_step(state, images_d, mask_d,
                                    jax.random.fold_in(rng, n_batches),
                                    jnp.float32(beta))
                # weight per-batch psnr/ssim by example count on device
                m = dict(m)
                m["psnr"] = m["psnr"] * m["n"]
                m["ssim"] = m["ssim"] * m["n"]
            n_batches += 1
            acc = m if acc is None else jax.tree_util.tree_map(
                jnp.add, acc, m)
        if acc is None:
            return state, {}
        acc = jax.device_get(acc)  # single sync point per epoch
        out = {k: float(acc[k]) / max(n_batches, 1)
               for k in ("loss", "recon", "kl")}
        if not train and float(acc.get("n", 0.0)) > 0:
            out["psnr"] = float(acc["psnr"]) / float(acc["n"])
            out["ssim"] = float(acc["ssim"]) / float(acc["n"])
        return state, out

    def train(
        self,
        state: TrainState,
        train_loader: DataLoader,
        val_loader: DataLoader,
        num_epochs: int,
        early_stop: int = 0,
        checkpoint_dir: Optional[Path] = None,
        logger=None,
        output_dir: Optional[Path] = None,
        save_latents_flag: bool = True,
        kl_anneal_epochs: int = 0,
        beta: float = 1.0,
    ) -> TrainState:
        ckptr = Checkpointer(checkpoint_dir) if checkpoint_dir else None
        if output_dir is not None:
            Path(output_dir).mkdir(parents=True, exist_ok=True)
        rng = jax.random.key(self.seed + 1)
        best_val = float("inf")
        no_improve = 0
        num_pixels = int(np.prod(train_loader.split.image_shape))
        # device-side snapshot: the fast path donates state buffers each
        # epoch, so best must be copied — but ON DEVICE (~free) instead of
        # a per-improvement device_get, which pulls the params through the
        # tunnel every epoch early in training (improvements are constant).
        # One jitted copy program (eager per-leaf jnp.copy would compile
        # one tiny remote program per leaf).
        snapshot = jax.jit(
            lambda s: jax.tree_util.tree_map(jnp.copy, s))
        best_dev = snapshot(state)
        best_epoch = 0
        save_stride, write_est, last_best_write = 1, 0.0, 0

        # device-resident fast path (one dispatch per epoch) unless host-side
        # augmentation forces per-batch host work
        fast = not train_loader.augment
        if fast:
            bs = train_loader.batch_size
            train_epoch_fn, eval_epoch_fn = self._build_epoch_fns(bs)
            tr_data, tr_mask, tr_steps, tr_pad = self._device_dataset(train_loader, bs)
            va_data, va_mask, va_steps, va_pad = self._device_dataset(val_loader, bs)
            va_n = float(val_loader.num_examples)

        import time as _time

        for epoch in range(1, num_epochs + 1):
            t_ep = _time.perf_counter()
            cur_beta = beta * min(1.0, epoch / kl_anneal_epochs) if kl_anneal_epochs > 0 else beta
            ep_rng = jax.random.fold_in(rng, epoch)
            if fast:
                perm = jax.random.permutation(jax.random.fold_in(ep_rng, 0), tr_pad)
                state, tr_m = train_epoch_fn(state, tr_data, tr_mask, perm,
                                             ep_rng, jnp.float32(cur_beta),
                                             n_steps=tr_steps)
                va_sums = eval_epoch_fn(state, va_data, va_mask,
                                        jnp.arange(va_pad), ep_rng,
                                        jnp.float32(cur_beta),
                                        n_steps=va_steps)
                tr_m, va_sums = jax.device_get((tr_m, va_sums))
                tr = {"loss": float(tr_m[0]), "recon": float(tr_m[1]),
                      "kl": float(tr_m[2])}
                va = {"loss": float(va_sums[0]) / va_steps,
                      "recon": float(va_sums[1]) / va_steps,
                      "kl": float(va_sums[2]) / va_steps,
                      "psnr": float(va_sums[3]) / max(va_n, 1.0),
                      "ssim": float(va_sums[4]) / max(va_n, 1.0)}
            else:
                state, tr = self.run_epoch(state, train_loader, True, epoch, cur_beta, ep_rng)
                state, va = self.run_epoch(state, val_loader, False, epoch, cur_beta, ep_rng)

            if logger is not None:
                logger.log_metrics({
                    "train_loss": tr["loss"], "train_recon": tr["recon"],
                    "train_kl": tr["kl"], "val_loss": va["loss"],
                    "val_recon": va["recon"], "val_kl": va["kl"],
                    "beta": cur_beta,
                    "val_psnr": va.get("psnr", 0.0), "val_ssim": va.get("ssim", 0.0),
                    "train_recon_per_pixel": tr["recon"] / num_pixels,
                    "val_recon_per_pixel": va["recon"] / num_pixels,
                }, step=epoch)
            print(f"[vae] epoch {epoch}/{num_epochs} beta={cur_beta:.4f} "
                  f"train={tr['loss']:.4f} val={va['loss']:.4f} "
                  f"psnr={va.get('psnr', 0.0):.2f} ssim={va.get('ssim', 0.0):.4f} "
                  f"({_time.perf_counter() - t_ep:.1f}s)")

            dt_epoch = _time.perf_counter() - t_ep
            if va["loss"] < best_val:
                best_val = va["loss"]
                no_improve = 0
                best_dev = snapshot(state)
                best_epoch = epoch
                # crash-safe best, like the reference's best.pt (engine.py:
                # 143, weights only) — written at the cadence one async
                # write (tunnel pull + serialize) actually sustains; the
                # full state follows after the loop. Gated on epochs SINCE
                # the last best write (not epoch modulo), so an improvement
                # on an off-stride epoch still persists within one stride.
                if ckptr and (epoch - last_best_write >= save_stride
                              or epoch == num_epochs):
                    t_ck = _time.perf_counter()
                    ckptr.save_async("best", {
                        "params": best_dev.params,
                        "batch_stats": best_dev.batch_stats,
                        "step": int(best_dev.step), "epoch": epoch})
                    last_best_write = epoch
                    write_est = max(_time.perf_counter() - t_ck,
                                    0.7 * write_est)
                    save_stride = max(1, min(
                        25, int(write_est / max(dt_epoch, 1e-3))))
            else:
                no_improve += 1
                if early_stop and no_improve >= early_stop:
                    print(f"[vae] early stopping at epoch {epoch}")
                    break

        best_state = jax.device_get(best_dev)  # one tunnel pull at the end
        if ckptr:
            ckptr.save("best", {"params": best_state.params,
                                "batch_stats": best_state.batch_stats,
                                "opt_state": best_state.opt_state,
                                "step": int(best_state.step),
                                "epoch": best_epoch})
            ckptr.save("latest", {"params": state.params,
                                  "batch_stats": state.batch_stats,
                                  "opt_state": state.opt_state,
                                  "step": int(state.step),
                                  "epoch": num_epochs})

        if save_latents_flag and output_dir is not None:
            self.dump_latents(best_state, train_loader, Path(output_dir) / "latents_train")
            self.dump_latents(best_state, val_loader, Path(output_dir) / "latents_val")
        if output_dir is not None:
            self._save_recon_grid(best_state, val_loader, Path(output_dir), logger)
        return state

    # -- artifact dumps --------------------------------------------------------
    def dump_latents(self, state, loader: DataLoader, out_dir: Path) -> Path:
        """Full-dataset encode sweep in ONE jitted scan (dataset order, so
        latents align with labels/codes downstream). Replaces the
        reference's second per-batch forward pass (engine.py:153-155)."""
        model = self.model
        bs = loader.batch_size
        data, _, n_steps, n_pad = self._device_dataset(loader, bs)
        n = loader.num_examples
        rng = jax.random.key(self.seed + 2)

        @functools.partial(jax.jit, static_argnames=("n_steps",))
        def encode_sweep(state, data, rng, n_steps):
            variables = self._variables(state.params, state.batch_stats)
            idx = jnp.arange(n_steps * bs).reshape(n_steps, bs)

            def body(carry, ib):
                images = jnp.take(data, ib, axis=0)
                mu, logvar = model.apply(variables, images, False,
                                         method=model.encode)
                z = reparameterize(jax.random.fold_in(rng, ib[0]), mu, logvar)
                return carry, (z, mu, logvar)

            _, (z, mu, lv) = jax.lax.scan(body, None, idx)
            flat = lambda a: a.reshape(-1, *a.shape[2:])  # noqa: E731
            return flat(z), flat(mu), flat(lv)

        z, mu, lv = jax.device_get(encode_sweep(state, data, rng,
                                                n_steps=n_steps))
        return save_latents(out_dir, np.asarray(z)[:n], np.asarray(mu)[:n],
                            np.asarray(lv)[:n], loader.split.labels)

    def _save_recon_grid(self, state, val_loader: DataLoader, output_dir: Path,
                         logger=None) -> None:
        from ..parallel import run_on_cpu

        images, _, _ = next(iter(val_loader.epoch(0)))
        variables = self._variables(state.params, state.batch_stats)
        # one-off artifact decode: run on local CPU, not a remote compile
        x_logits, _, _, _ = run_on_cpu(
            lambda v, x: self.model.apply(v, x, jax.random.key(0), False),
            variables, jnp.asarray(images))
        # display space is [0,1]: sigmoid outputs are already there, while
        # non-sigmoid reconstructions live in the dataset's normalized space
        # (reference engine.py:186-202 find_normalize inversion)
        if self.model.apply_sigmoid:
            x_rec = np.asarray(jax.nn.sigmoid(x_logits))
        else:
            x_rec = val_loader.split.denormalize(np.asarray(x_logits))
        x = val_loader.split.denormalize(images)
        grid = np.concatenate([np.clip(x[:8], 0, 1), np.clip(x_rec[:8], 0, 1)])
        path = save_image_grid(grid, output_dir / "recon_grid.png", nrow=8)
        if logger is not None:
            logger.log_artifact(path)


