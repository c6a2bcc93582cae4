"""Import reference PyTorch checkpoints (.pth) into yunet_tpu param pytrees.

The reference checkpoint key layout is deterministic (SURVEY.md §5):
  backbone.model{0..5}.{conv1,conv2,bn,bn1}...
  neck.lateral_convs.{0,1,2}...
  bbox_head.multi_level_{share_convs,cls,bbox,obj,kps}.{lvl}...

Conversion rules:
  torch Conv2d weight (O, I, kh, kw)  -> HWIO (kh, kw, I, O)
  torch depthwise    (C, 1, kh, kw)  -> HWIO (kh, kw, 1, C)
  BN {weight,bias}                   -> params {scale, bias}
  BN {running_mean,running_var}      -> state  {mean, var}

Only depends on numpy for the tree; torch is imported lazily so the rest of
the framework never requires it.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _to_np(t) -> np.ndarray:
    return t.detach().cpu().numpy().astype(np.float32)


def _conv(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    w = _to_np(sd[f"{prefix}.weight"])  # (O, I, kh, kw)
    b = _to_np(sd[f"{prefix}.bias"])
    return {"w": np.transpose(w, (2, 3, 1, 0)), "b": b}


def _bn(sd: Dict[str, Any], prefix: str
        ) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    p = {"scale": _to_np(sd[f"{prefix}.weight"]),
         "bias": _to_np(sd[f"{prefix}.bias"])}
    s = {"mean": _to_np(sd[f"{prefix}.running_mean"]),
         "var": _to_np(sd[f"{prefix}.running_var"])}
    return p, s


def _conv_dp(sd, prefix: str, with_bn: bool):
    p = {"conv1": _conv(sd, f"{prefix}.conv1"),
         "conv2": _conv(sd, f"{prefix}.conv2")}
    s = {}
    if with_bn:
        p["bn"], s["bn"] = _bn(sd, f"{prefix}.bn")
    return p, s


def load_pth_params(path: str, *, num_stages: int = 6, num_levels: int = 3,
                    shared_stacked_convs: int = 1, use_kps: bool = True):
    """Load a reference checkpoint into (params, state) numpy pytrees.

    Returns trees structurally identical to YuNet.init() output, so they can
    be passed straight into YuNet.forward (jnp will ingest numpy leaves).
    """
    import torch  # local import: only needed for checkpoint ingestion

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)

    params: Dict[str, Any] = {"backbone": {}, "neck": {"lateral_convs": {}},
                              "head": {}}
    state: Dict[str, Any] = {"backbone": {}, "neck": {"lateral_convs": {}},
                             "head": {}}

    # backbone: model0 is the stem (Conv_head)
    p0 = {"conv1": _conv(sd, "backbone.model0.conv1")}
    p0["bn1"], bn1_s = _bn(sd, "backbone.model0.bn1")
    p0["conv2"], c2_s = _conv_dp(sd, "backbone.model0.conv2", with_bn=True)
    params["backbone"]["model0"] = p0
    state["backbone"]["model0"] = {"bn1": bn1_s, "conv2": c2_s}
    for i in range(1, num_stages):
        pref = f"backbone.model{i}"
        p1, s1 = _conv_dp(sd, f"{pref}.conv1", with_bn=True)
        p2, s2 = _conv_dp(sd, f"{pref}.conv2", with_bn=True)
        params["backbone"][f"model{i}"] = {"conv1": p1, "conv2": p2}
        state["backbone"][f"model{i}"] = {"conv1": s1, "conv2": s2}

    for i in range(num_levels):
        p, s = _conv_dp(sd, f"neck.lateral_convs.{i}", with_bn=True)
        params["neck"]["lateral_convs"][str(i)] = p
        state["neck"]["lateral_convs"][str(i)] = s

    head_p: Dict[str, Any] = {}
    head_s: Dict[str, Any] = {}
    if shared_stacked_convs > 0:
        head_p["multi_level_share_convs"] = {}
        head_s["multi_level_share_convs"] = {}
        for lvl in range(num_levels):
            sp, ss = {}, {}
            for j in range(shared_stacked_convs):
                p, s = _conv_dp(
                    sd, f"bbox_head.multi_level_share_convs.{lvl}.{j}",
                    with_bn=True)
                sp[str(j)], ss[str(j)] = p, s
            head_p["multi_level_share_convs"][str(lvl)] = sp
            head_s["multi_level_share_convs"][str(lvl)] = ss
    branches = ["multi_level_cls", "multi_level_bbox", "multi_level_obj"]
    if use_kps:
        branches.append("multi_level_kps")
    for b in branches:
        head_p[b] = {}
        head_s[b] = {}
        for lvl in range(num_levels):
            p, s = _conv_dp(sd, f"bbox_head.{b}.{lvl}", with_bn=False)
            head_p[b][str(lvl)] = p
            head_s[b][str(lvl)] = s
    params["head"] = head_p
    state["head"] = head_s
    return params, state
