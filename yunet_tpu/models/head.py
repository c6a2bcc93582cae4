"""YuNet head (forward only) — reference mmdet/models/dense_heads/yunet_head.py:112-247.

Per level (one per stride): optional shared ConvDPUnit stack, then four
prediction ConvDPUnits without BN — cls (num_classes ch), bbox (4 ch),
obj (1 ch), kps (2*NK ch). Loss / assignment / decode live in ops/ and
train/; the head here is a pure forward. Outputs are NHWC maps.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from .layers import Params, State, conv_dp_unit, conv_dp_unit_init


def yunet_head_init(key, *, num_levels: int, in_channels: int,
                    feat_channels: int, shared_stacked_convs: int,
                    num_classes: int, kps_num: int,
                    use_kps: bool = True) -> Tuple[Params, State]:
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    branches = ["multi_level_cls", "multi_level_bbox", "multi_level_obj"]
    if use_kps:
        branches.append("multi_level_kps")
    if shared_stacked_convs > 0:
        p["multi_level_share_convs"] = {}
        s["multi_level_share_convs"] = {}
    for b in branches:
        p[b] = {}
        s[b] = {}
    out_ch = {"multi_level_cls": num_classes, "multi_level_bbox": 4,
              "multi_level_obj": 1, "multi_level_kps": kps_num * 2}
    for lvl in range(num_levels):
        key, *ks = jax.random.split(key, 2 + shared_stacked_convs +
                                    len(branches))
        if shared_stacked_convs > 0:
            stack_p, stack_s = {}, {}
            for i in range(shared_stacked_convs):
                cin = in_channels if i == 0 else feat_channels
                stack_p[str(i)], stack_s[str(i)] = conv_dp_unit_init(
                    ks[i], cin, feat_channels, with_bn=True)
            p["multi_level_share_convs"][str(lvl)] = stack_p
            s["multi_level_share_convs"][str(lvl)] = stack_s
            chn = feat_channels
        else:
            chn = in_channels
        for j, b in enumerate(branches):
            p[b][str(lvl)], s[b][str(lvl)] = conv_dp_unit_init(
                ks[shared_stacked_convs + j], chn, out_ch[b], with_bn=False)
    return p, s


def yunet_head(p: Params, s: State, feats: List[jnp.ndarray], *,
               train: bool = False, fused: bool = False,
               composed: bool = False, bn_group: int = 0
               ) -> Tuple[Dict[str, List[jnp.ndarray]], State]:
    """Returns dict of per-level NHWC maps: cls, bbox, obj, kps."""
    new_s: Dict[str, Any] = {b: {} for b in s}
    use_kps = "multi_level_kps" in p
    shared = "multi_level_share_convs" in p
    out: Dict[str, List[jnp.ndarray]] = {
        "cls": [], "bbox": [], "obj": []}
    if use_kps:
        out["kps"] = []
    for lvl, feat in enumerate(feats):
        l = str(lvl)
        if shared:
            stack_new = {}
            for i in sorted(p["multi_level_share_convs"][l],
                            key=int):
                feat, stack_new[i] = conv_dp_unit(
                    p["multi_level_share_convs"][l][i],
                    s["multi_level_share_convs"][l][i], feat, train=train,
                    fused=fused, composed=composed, bn_group=bn_group)
            new_s["multi_level_share_convs"][l] = stack_new
        # The four prediction branches run as ONE ConvDPUnit whose
        # weights are the branch weights concatenated along the output
        # channel axis, sliced back afterwards. Identical math (output
        # channels of a conv are independent), but the 1/4/1/10-channel
        # convs are pathological on TPU — their depthwise weight grads
        # alone cost ~2 ms/step at 640² b64 — while the combined
        # 16-channel unit tiles cleanly.
        branch_names = ["multi_level_cls", "multi_level_bbox",
                        "multi_level_obj"]
        if use_kps:
            branch_names.append("multi_level_kps")
        pf = {"conv1": {
                  "w": jnp.concatenate(
                      [p[b][l]["conv1"]["w"] for b in branch_names], -1),
                  "b": jnp.concatenate(
                      [p[b][l]["conv1"]["b"] for b in branch_names], -1)},
              "conv2": {
                  "w": jnp.concatenate(
                      [p[b][l]["conv2"]["w"] for b in branch_names], -1),
                  "b": jnp.concatenate(
                      [p[b][l]["conv2"]["b"] for b in branch_names], -1)}}
        y, _ = conv_dp_unit(pf, {}, feat, train=train, fused=fused,
                            composed=composed)
        off = 0
        for b in branch_names:
            ch = p[b][l]["conv1"]["w"].shape[-1]
            out[b.replace("multi_level_", "")].append(
                y[..., off:off + ch])
            off += ch
            new_s[b][l] = {}
    return out, new_s


def flatten_level_outputs(out: Dict[str, List[jnp.ndarray]]
                          ) -> Dict[str, jnp.ndarray]:
    """Concatenate per-level NHWC maps into (B, total_priors, C) tensors.

    Row order within each level is row-major over (H, W), matching the
    reference's permute(0,2,3,1).reshape(B,-1,C) flattening
    (yunet_head.py:331-349) and the prior grid order of
    MlvlPointGenerator (point_generator.py:119-175).
    """
    flat: Dict[str, jnp.ndarray] = {}
    for k, maps in out.items():
        flat[k] = jnp.concatenate(
            [m.reshape(m.shape[0], -1, m.shape[-1]) for m in maps], axis=1)
    return flat
