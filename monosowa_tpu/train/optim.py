"""Optimizer + LR schedule.

Behavioral contract (MonoDETR/lib/helpers/optimizer_helper.py:6-129,
scheduler_helper.py:6-88): AdamW with weight decay applied only to weight
matrices (biases and norm parameters excluded); step decay x0.1 at epochs
[125, 165]; optional cosine warmup over the first 5 epochs.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import optax


def weight_decay_mask(params) -> dict:
    """True (decay) for rank>=2 kernels, False for biases/norm scales."""
    import jax

    def is_weight(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        return jnp.ndim(leaf) >= 2 and name in ("kernel", "embedding")

    return jax.tree_util.tree_map_with_path(is_weight, params)


def make_lr_schedule(base_lr: float, steps_per_epoch: int,
                     decay_epochs: Sequence[int] = (125, 165),
                     decay_rate: float = 0.1,
                     warmup_epochs: int = 0) -> optax.Schedule:
    boundaries = {int(e * steps_per_epoch): decay_rate for e in decay_epochs}
    step_fn = optax.piecewise_constant_schedule(base_lr, boundaries)
    if warmup_epochs <= 0:
        return step_fn
    warmup_steps = warmup_epochs * steps_per_epoch

    def schedule(step):
        warm = base_lr * (1 - jnp.cos(jnp.pi * step / warmup_steps)) / 2
        return jnp.where(step < warmup_steps, warm, step_fn(step))

    return schedule


def make_optimizer(base_lr: float = 2e-4, weight_decay: float = 1e-4,
                   steps_per_epoch: int = 1,
                   decay_epochs: Sequence[int] = (125, 165),
                   decay_rate: float = 0.1,
                   warmup_epochs: int = 0,
                   grad_clip: float = 0.0) -> optax.GradientTransformation:
    sched = make_lr_schedule(base_lr, steps_per_epoch, decay_epochs,
                             decay_rate, warmup_epochs)
    tx = optax.adamw(learning_rate=sched, weight_decay=weight_decay,
                     mask=weight_decay_mask)
    if grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx
