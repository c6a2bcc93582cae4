"""TFPN neck — reference mmdet/models/necks/tfpn.py:9-45.

Tiny top-down FPN: a ConvDPUnit lateral conv per level, applied top-down;
each lower level accumulates the 2x nearest-upsampled refined level above it
*before* its own lateral conv runs (the reference mutates the feature list in
place, so level i-1's lateral conv sees feats[i-1] + up(lateral(feats[i]))).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from .layers import Params, State, conv_dp_unit, conv_dp_unit_init


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """2x nearest-neighbour upsample, NHWC (== F.interpolate nearest)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def tfpn_init(key, in_channels: Sequence[int]) -> Tuple[Params, State]:
    keys = jax.random.split(key, len(in_channels))
    p: Dict[str, Any] = {"lateral_convs": {}}
    s: Dict[str, Any] = {"lateral_convs": {}}
    for i, c in enumerate(in_channels):
        p["lateral_convs"][str(i)], s["lateral_convs"][str(i)] = \
            conv_dp_unit_init(keys[i], c, c, with_bn=True)
    return p, s


def tfpn(p: Params, s: State, feats: List[jnp.ndarray], *,
         out_idx: Sequence[int], train: bool = False, fused: bool = False,
         composed: bool = False,
         bn_group: int = 0) -> Tuple[List[jnp.ndarray], State]:
    feats = list(feats)
    new_s: Dict[str, Any] = {"lateral_convs": {}}
    num = len(feats)
    for i in range(num - 1, 0, -1):
        feats[i], new_s["lateral_convs"][str(i)] = conv_dp_unit(
            p["lateral_convs"][str(i)], s["lateral_convs"][str(i)],
            feats[i], train=train, fused=fused, composed=composed,
            bn_group=bn_group)
        feats[i - 1] = feats[i - 1] + upsample2x_nearest(feats[i])
    feats[0], new_s["lateral_convs"]["0"] = conv_dp_unit(
        p["lateral_convs"]["0"], s["lateral_convs"]["0"], feats[0],
        train=train, fused=fused, composed=composed, bn_group=bn_group)
    return [feats[i] for i in out_idx], new_s
