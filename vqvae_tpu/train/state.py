"""Train state and optimizer construction.

Optimizers mirror the reference's choices (AdamW default, optional Adam,
per-epoch CosineAnnealingLR — reference src/scripts/train_vanilla_vae.py:
55-65) as optax chains with gradient clipping folded in (the reference
clips by global norm inside the step, engine.py:44-46).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import optax
from flax import struct
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None
    epoch_rng: Any = struct.field(pytree_node=True, default=None)


def cosine_per_epoch_schedule(base_lr: float, t_max_epochs: int,
                              steps_per_epoch: int) -> optax.Schedule:
    """torch CosineAnnealingLR stepped per epoch: within an epoch the LR is
    constant; eta_min = 0."""
    import jax.numpy as jnp

    def schedule(step):
        epoch = jnp.minimum(step // max(1, steps_per_epoch), t_max_epochs)
        return base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * epoch / max(1, t_max_epochs)))

    return schedule


def make_optimizer(
    lr: float,
    weight_decay: float = 0.0,
    optimizer: str = "adamw",
    grad_clip_max_norm: float = 0.0,
    cosine_t_max: Optional[int] = None,
    steps_per_epoch: int = 1,
) -> optax.GradientTransformation:
    if cosine_t_max:
        schedule = cosine_per_epoch_schedule(lr, cosine_t_max, steps_per_epoch)
    else:
        schedule = lr
    if optimizer == "adamw":
        tx = optax.adamw(schedule, weight_decay=weight_decay)
    elif optimizer == "adam":
        tx = optax.adam(schedule)
    else:
        raise ValueError(f"unknown optimizer {optimizer}")
    if grad_clip_max_norm and grad_clip_max_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_max_norm), tx)
    return tx
