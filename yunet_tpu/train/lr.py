"""LR schedule: linear warmup + epoch-step decay (+ linear batch scaling).

Reference recipe (configs/yunet_n.py:1-12, apis/train.py:71-114):
SGD lr 0.01 at global batch 32, linear warmup over 1500 iters from
ratio 0.001, x0.1 step decay at epochs 400 and 544 (of 640).
mmcv warmup multiplier: 1 - (1 - iter/warmup_iters) * (1 - warmup_ratio).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def scale_lr(base_lr: float, total_batch: int, base_batch: int = 32) -> float:
    """Linear LR scaling rule (reference auto_scale_lr semantics)."""
    return base_lr * total_batch / base_batch


def lr_schedule(base_lr: float, *, steps_per_epoch: int, warmup_iters: int,
                warmup_ratio: float, decay_epochs: Sequence[int],
                decay_factor: float):
    """Returns a jittable step -> lr function."""
    decay_epochs = jnp.asarray(list(decay_epochs), jnp.int32)

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        epoch = jnp.floor(step / steps_per_epoch)
        n_decays = jnp.sum(epoch >= decay_epochs.astype(jnp.float32))
        lr = base_lr * decay_factor ** n_decays
        frac = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
        warm = 1.0 - (1.0 - frac) * (1.0 - warmup_ratio)
        return lr * jnp.where(step < warmup_iters, warm, 1.0)

    return sched
