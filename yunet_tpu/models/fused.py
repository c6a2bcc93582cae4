"""Fused-kernel inference forward: BN folded, every ConvDPUnit executed by
the Pallas fused pw->dw->relu kernel (ops/convdp_pallas.py).

Numerically equivalent to YuNet.forward(train=False) with running BN
stats (the folding is the same transform the C++/ONNX exporters apply);
used by Detector(fused=True) for serving.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..export.cpp_export import fold_conv_bn
from ..ops.convdp_pallas import fused_conv_dp
from .backbone import max_pool2x
from .neck import upsample2x_nearest


def _fold_unit(p, s) -> Dict[str, Any]:
    if "bn" in p:
        wd, bd = fold_conv_bn(p["conv2"]["w"], p["conv2"]["b"],
                              p["bn"], s["bn"])
        return {"w1": p["conv1"]["w"], "b1": p["conv1"]["b"],
                "wd": wd, "bd": bd, "relu": True}
    return {"w1": p["conv1"]["w"], "b1": p["conv1"]["b"],
            "wd": p["conv2"]["w"], "bd": p["conv2"]["b"], "relu": False}


def fold_inference_params(params, state, cfg: ModelConfig):
    """Fold BN into conv weights across the whole model; returns a pytree
    of fused-unit params mirroring the model topology."""
    out: Dict[str, Any] = {"backbone": {}, "neck": {}, "head": {}}
    bb_p, bb_s = params["backbone"], state["backbone"]
    p0, s0 = bb_p["model0"], bb_s["model0"]
    w, b = fold_conv_bn(p0["conv1"]["w"], p0["conv1"]["b"], p0["bn1"],
                        s0["bn1"])
    out["backbone"]["stem_conv"] = {"w": jnp.asarray(w), "b": jnp.asarray(b)}
    out["backbone"]["stem_dp"] = _fold_unit(p0["conv2"], s0["conv2"])
    for i in range(1, len(cfg.stage_channels)):
        p, s = bb_p[f"model{i}"], bb_s[f"model{i}"]
        out["backbone"][f"m{i}a"] = _fold_unit(p["conv1"], s["conv1"])
        out["backbone"][f"m{i}b"] = _fold_unit(p["conv2"], s["conv2"])
    for i in range(len(cfg.neck_in_channels)):
        out["neck"][str(i)] = _fold_unit(
            params["neck"]["lateral_convs"][str(i)],
            state["neck"]["lateral_convs"][str(i)])
    hp, hs = params["head"], state["head"]
    for lvl in range(len(cfg.strides)):
        lvl_d: Dict[str, Any] = {}
        if "multi_level_share_convs" in hp:
            lvl_d["share"] = [
                _fold_unit(hp["multi_level_share_convs"][str(lvl)][j],
                           hs["multi_level_share_convs"][str(lvl)][j])
                for j in sorted(hp["multi_level_share_convs"][str(lvl)],
                                key=int)]
        for key, branch in (("cls", "multi_level_cls"),
                            ("bbox", "multi_level_bbox"),
                            ("obj", "multi_level_obj"),
                            ("kps", "multi_level_kps")):
            if branch in hp:
                lvl_d[key] = _fold_unit(hp[branch][str(lvl)],
                                        hs[branch][str(lvl)])
        out["head"][str(lvl)] = lvl_d
    # NOTE: 'relu' flags stay python bools (static kernel config); weight
    # leaves stay host arrays — fused_forward closes over them so they are
    # jit constants.
    return out


def _s2d_stem_weights(w) -> "np.ndarray":
    """(3,3,C,O) stride-2 weights -> (2,2,4C,O) space-to-depth form.

    Output pixel (i,j) of the 3x3/s2 conv reads input rows 2i-1..2i+1;
    in 2x2-block space that is block rows i-1 (phase p=1) and i (p=0,1),
    i.e. a 2x2 kernel over blocks with per-phase taps
    ``dy = 2*bi + p - 1`` (the (bi=0, p=0) phase falls outside the 3x3
    support and stays zero). Same for columns. Channel order of the
    s2d input is (p, q, c) = p*2C + q*C + c.
    """
    import numpy as np
    w = np.asarray(w)
    c, o = w.shape[2], w.shape[3]
    w2 = np.zeros((2, 2, 4 * c, o), w.dtype)
    for bi in range(2):
        for p in range(2):
            dy = 2 * bi + p - 1
            if not 0 <= dy <= 2:
                continue
            for bj in range(2):
                for q in range(2):
                    dx = 2 * bj + q - 1
                    if not 0 <= dx <= 2:
                        continue
                    w2[bi, bj, p * 2 * c + q * c:
                       p * 2 * c + (q + 1) * c] = w[dy, dx]
    return w2


def _stem_s2d(x: jnp.ndarray, w, b) -> jnp.ndarray:
    """The stem 3x3/s2 conv+bias+relu computed in space-to-depth form:
    (B,H,W,C) -> 2x2 blocks (B,H/2,W/2,4C) -> equivalent 2x2/s1 conv.

    Mathematically identical taps (zeros where the support falls
    outside), summed in a different order — parity-tested in
    tests/test_detect.py. Motivation: the plain 3-channel stem fills
    3/128 conv input lanes and ran at ~57 GB/s in the serve profile;
    the s2d form quadruples the channel dim and halves the spatial
    extent of the input relayout.
    """
    n, h, ww, c = x.shape
    xx = x.reshape(n, h // 2, 2, ww // 2, 2, c)
    xx = xx.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, ww // 2, 4 * c)
    w2 = jnp.asarray(_s2d_stem_weights(w)).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        xx, w2, (1, 1), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.maximum(y + jnp.asarray(b).astype(y.dtype), 0)


def _unit(u, x, use_pallas: bool = True, composed: bool = False):
    if use_pallas:
        return fused_conv_dp(x, jnp.asarray(u["w1"]), jnp.asarray(u["b1"]),
                             jnp.asarray(u["wd"]), jnp.asarray(u["bd"]),
                             relu=u["relu"])
    if composed:
        # Same pw(1x1)·dw(3x3) -> one dense 3x3 composition the train
        # step uses (layers._composed_pw_dw): the folded unit is exactly
        # the bias-carrying pw->dw pair, so the closed-form bias field
        # applies verbatim. Removes the pointwise intermediate's HBM
        # round-trip from the serving forward at ~6x more MXU MACs.
        from .layers import _composed_pw_dw
        y = _composed_pw_dw(
            {"conv1": {"w": jnp.asarray(u["w1"]),
                       "b": jnp.asarray(u["b1"])},
             "conv2": {"w": jnp.asarray(u["wd"])}},
            x, jnp.asarray(u["bd"]))
        return jnp.maximum(y, 0) if u["relu"] else y
    from .layers import conv2d
    y = conv2d(x, jnp.asarray(u["w1"]), jnp.asarray(u["b1"]))
    y = conv2d(y, jnp.asarray(u["wd"]), jnp.asarray(u["bd"]), padding=1,
               depthwise=True)
    return jnp.maximum(y, 0) if u["relu"] else y


def fused_forward(folded, x: jnp.ndarray, cfg: ModelConfig, *,
                  use_pallas: bool = True, stem_s2d: bool = False,
                  composed: bool = False
                  ) -> Dict[str, List[jnp.ndarray]]:
    """x: (N, H, W, 3) raw BGR float. Returns per-level NHWC maps.

    use_pallas: True runs every ConvDPUnit through the Pallas fused
    pw->dw->relu kernel — fastest at batch 1, where XLA cannot fill the
    lane dimension either way and keeping y1 in VMEM wins. False runs
    the folded weights through XLA's conv emitters — ~1.9x faster at
    batch >= 16 (measured 5459 vs 2916 img/s at 320^2 b16 with honest
    readback sync: XLA's batch-minor layouts fill the lanes and its
    depthwise runs on the MXU, which the stencil kernel cannot match).
    """
    bb = folded["backbone"]
    if stem_s2d:
        y = _stem_s2d(x, bb["stem_conv"]["w"], bb["stem_conv"]["b"])
    else:
        y = jax.lax.conv_general_dilated(
            x, bb["stem_conv"]["w"].astype(x.dtype), (2, 2),
            ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jnp.maximum(y + bb["stem_conv"]["b"].astype(y.dtype), 0)
    y = _unit(bb["stem_dp"], y, use_pallas, composed)
    feats: List[jnp.ndarray] = []
    for i in range(len(cfg.stage_channels)):
        if i > 0:
            y = _unit(bb[f"m{i}a"], y, use_pallas, composed)
            y = _unit(bb[f"m{i}b"], y, use_pallas, composed)
        if i in cfg.out_idx:
            feats.append(y)
        if i in cfg.downsample_idx:
            y = max_pool2x(y)
    for i in range(len(feats) - 1, 0, -1):
        feats[i] = _unit(folded["neck"][str(i)], feats[i], use_pallas, composed)
        feats[i - 1] = feats[i - 1] + upsample2x_nearest(feats[i])
    feats[0] = _unit(folded["neck"]["0"], feats[0], use_pallas, composed)

    outs: Dict[str, List[jnp.ndarray]] = {"cls": [], "bbox": [],
                                          "obj": [], "kps": []}
    for lvl, f in enumerate(feats):
        d = folded["head"][str(lvl)]
        for u in d.get("share", []):
            f = _unit(u, f, use_pallas, composed)
        for key in ("cls", "bbox", "obj", "kps"):
            if key in d:
                outs[key].append(_unit(d[key], f, use_pallas, composed))
    return outs
