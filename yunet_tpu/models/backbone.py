"""YuNet backbone — reference mmdet/models/backbones/yunet_backbone.py:8-41.

Six sequential stages (stem + five Conv4layerBlocks), with 2x max-pool after
the stages listed in ``downsample_idx`` and features emitted for the stages
in ``out_idx`` (strides 8/16/32 for the shipped configs).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from .layers import (Params, State, conv4layer_block, conv4layer_block_init,
                     conv_head, conv_head_init)


def max_pool2x_reduce_window(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 max pool via lax.reduce_window. Exact torch semantics, but
    its gradient lowers to SelectAndScatter, which XLA:TPU emits as a
    slow windowed scan (~3 ms/step at 640^2 batch 128)."""
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else
        jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID")


def max_pool2x_slices(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 max pool as an elementwise max of 4 strided slices (NHWC;
    the lane-major C axis is untouched, so the slices are cheap).

    Forward is bit-identical to F.max_pool2d (floor semantics via the
    even-truncating slice bounds). Backward becomes the VJP of
    jnp.maximum — an eq-mask select — instead of SelectAndScatter. The
    one semantic difference is tie handling in the gradient: torch
    routes the window's gradient to the first max element; the nested
    maximum here routes it to one deterministic winner per comparison
    tree. The gradient sum over the window is identical, and ties occur
    essentially only at ReLU zeros, where the subgradient choice is
    arbitrary anyway.
    """
    h2 = x.shape[1] // 2 * 2
    w2 = x.shape[2] // 2 * 2
    x = x[:, :h2, :w2]
    return jnp.maximum(
        jnp.maximum(x[:, 0::2, 0::2], x[:, 0::2, 1::2]),
        jnp.maximum(x[:, 1::2, 0::2], x[:, 1::2, 1::2]))


def max_pool2x_reshape(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 max pool as a reshape VIEW plus a max over the two window
    axes. Unlike max_pool2x_slices there are no strided slices — the
    reshape keeps the minor (channel) dim untouched and is layout-free.
    Backward is jnp.max's VJP: an eq-mask select fused elementwise
    (gradient split evenly among tied maxima — ties occur essentially
    only at ReLU zeros; torch routes to the first element instead)."""
    b = x.shape[0]
    h2 = x.shape[1] // 2
    w2 = x.shape[2] // 2
    c = x.shape[3]
    x = x[:, :h2 * 2, :w2 * 2]
    return x.reshape(b, h2, 2, w2, 2, c).max(axis=(2, 4))


max_pool2x = max_pool2x_reduce_window


def yunet_backbone_init(key, stage_channels: Sequence[Sequence[int]]
                        ) -> Tuple[Params, State]:
    keys = jax.random.split(key, len(stage_channels))
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    p["model0"], s["model0"] = conv_head_init(keys[0], *stage_channels[0])
    for i in range(1, len(stage_channels)):
        p[f"model{i}"], s[f"model{i}"] = conv4layer_block_init(
            keys[i], *stage_channels[i])
    return p, s


def yunet_backbone(p: Params, s: State, x: jnp.ndarray, *,
                   downsample_idx: Sequence[int], out_idx: Sequence[int],
                   train: bool = False, fused: bool = False,
                   composed: bool = False,
                   bn_group: int = 0,
                   remat_stages: Sequence[int] = ()
                   ) -> Tuple[List[jnp.ndarray], State]:
    num_stages = len(p)
    outs: List[jnp.ndarray] = []
    new_s: Dict[str, Any] = {}
    for i in range(num_stages):
        name = f"model{i}"
        fn = conv_head if i == 0 else conv4layer_block
        call = functools.partial(fn, train=train, fused=fused,
                                 composed=composed, bn_group=bn_group)
        if train and i in remat_stages:
            # recompute this stage's intermediates in the backward pass
            # instead of round-tripping them through HBM (see
            # ModelConfig.remat_stages)
            call = jax.checkpoint(
                call, policy=jax.checkpoint_policies.nothing_saveable)
        x, new_s[name] = call(p[name], s[name], x)
        if i in out_idx:
            outs.append(x)
        if i in downsample_idx:
            x = max_pool2x(x)
    return outs, new_s
