"""EMA weight shadowing — reference core/hook/ema.py:8-130 semantics.

ema = (1 - m(t)) * ema + m(t) * param, with the exponential-momentum
warmup of ExpMomentumEMAHook:
  m(t) = (1 - m0) * exp(-(1 + t) / total_iter) + m0
or the linear-momentum variant of LinearMomentumEMAHook:
  m(t) = min(m0^interval, (1 + t) / (warm_up + t))

Implemented as pure jittable update functions over param pytrees (BN
running stats live in `state` and are shadowed too when requested,
matching skip_buffers=False).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def exp_momentum(m0: float, total_iter: int = 2000) -> Callable:
    def fn(step):
        return (1.0 - m0) * jnp.exp(-(1.0 + step) / total_iter) + m0
    return fn


def linear_momentum(m0: float, warm_up: int = 100,
                    interval: int = 1) -> Callable:
    def fn(step):
        return jnp.minimum(m0 ** interval,
                           (1.0 + step) / (warm_up + step))
    return fn


def ema_update(ema: Any, params: Any, momentum) -> Any:
    """ema <- (1 - m) * ema + m * params, elementwise over the pytree."""
    return jax.tree.map(
        lambda e, p: e * (1.0 - momentum) + p.astype(e.dtype) * momentum,
        ema, params)


def make_ema_updater(m0: float, *, strategy: str = "exp",
                     total_iter: int = 2000, warm_up: int = 100):
    mom_fn = (exp_momentum(m0, total_iter) if strategy == "exp"
              else linear_momentum(m0, warm_up))

    @jax.jit
    def update(ema, params, step):
        return ema_update(ema, params, mom_fn(step.astype(jnp.float32)))

    return update
