"""C++ weight-file generation for libfacedetection.

Produces a ``facedetectcnn-data.cpp`` with the same layout contract as the
reference exporter (tools/yunet2cpp.py:42-160):
  * Conv+BN folded into conv weights/bias (yunet2cpp.py:42-51);
  * module walk order = torch named_children order (backbone stages, neck
    lateral convs, head share/cls/bbox/obj/kps branches per level);
  * pointwise weights serialized in OIHW order; depthwise weights
    transposed to (9, C) kernel-position-major layout; the stem's 3x3x3
    conv repacked position-major and zero-padded to a 32-channel layout
    (yunet2cpp.py:53-99);
  * '%.3g' float formatting with the '.f'/'f' suffix convention and the
    ConvInfoStruct table.

Operates directly on yunet_tpu (params, state) pytrees (HWIO weights).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

from ..config import ModelConfig
from ..models.layers import BN_EPS

HEADER = (
    "// Auto generated data file\n"
    "// Copyright (c) 2018-2023, Shiqi Yu, all rights reserved.\n"
    "#include \"facedetectcnn.h\"\n\n")


def fold_conv_bn(w: np.ndarray, b: np.ndarray, bn_p: Dict[str, np.ndarray],
                 bn_s: Dict[str, np.ndarray],
                 eps: float = BN_EPS) -> Tuple[np.ndarray, np.ndarray]:
    """Fold BN into a conv. w: HWIO; returns (w', b') with
    y = conv(x, w') + b'  ==  bn(conv(x, w) + b)."""
    scale = np.asarray(bn_p["scale"]) / np.sqrt(
        np.asarray(bn_s["var"]) + eps)
    w2 = np.asarray(w) * scale  # broadcast over trailing O axis
    b2 = (np.asarray(b) - np.asarray(bn_s["mean"])) * scale \
        + np.asarray(bn_p["bias"])
    return w2.astype(np.float32), b2.astype(np.float32)


def _fmt(v: float, precision: str = ".3g") -> str:
    s = format(float(v), precision)
    if "." not in s and "e" not in s:
        return s + ".f"
    return s + "f"


def _serialize(w_hwio: np.ndarray, b: np.ndarray, name: str, *,
               depthwise: bool, with_bn: bool,
               first3x3x3: bool) -> Dict[str, Any]:
    kh, kw, ci, co = w_hwio.shape
    if first3x3x3:
        # position-major (k*3 + i) rows, zero-padded 27 -> 32
        w = np.transpose(w_hwio, (3, 0, 1, 2)).reshape(co, 27)
        w = np.hstack([w, np.zeros((co, 5), np.float32)]).reshape(-1)
        weight_size = f"{co}*32*1*1"
        in_ch = 32
    elif depthwise:
        # (9, C) kernel-position-major
        w = w_hwio.reshape(kh * kw, co).reshape(-1)
        weight_size = f"{co}*{1}*{kh}*{kw}"
        in_ch = co
    else:
        w = np.transpose(w_hwio, (3, 2, 0, 1)).reshape(-1)
        weight_size = f"{co}*{ci}*{kh}*{kw}"
        in_ch = ci
    return {
        "weight_name": f"{name}_weight", "weight_size": weight_size,
        "weight": ",".join(_fmt(v) for v in w),
        "bias_name": f"{name}_bias", "bias_size": str(co),
        "bias": ",".join(_fmt(v) for v in np.asarray(b).reshape(-1)),
        "with_bn": with_bn, "is_dw": depthwise,
        "in_channels": in_ch, "out_channels": co,
    }


def _emit_conv_dp(entries, p, s, name):
    """ConvDPUnit: pointwise (raw) + depthwise (BN-folded when present)."""
    entries.append(_serialize(
        np.asarray(p["conv1"]["w"]), np.asarray(p["conv1"]["b"]),
        name + "_pw", depthwise=False, with_bn=False, first3x3x3=False))
    if "bn" in p:
        w2, b2 = fold_conv_bn(p["conv2"]["w"], p["conv2"]["b"],
                              p["bn"], s["bn"])
        entries.append(_serialize(w2, b2, name + "_dw", depthwise=True,
                                  with_bn=True, first3x3x3=False))
    else:
        entries.append(_serialize(
            np.asarray(p["conv2"]["w"]), np.asarray(p["conv2"]["b"]),
            name + "_dw", depthwise=True, with_bn=False, first3x3x3=False))


def walk_modules(params, state, cfg: ModelConfig):
    """Yield (name, kind, p, s) in the reference's module discovery order."""
    bb_p, bb_s = params["backbone"], state["backbone"]
    yield ("backbone__model0", "conv_head", bb_p["model0"], bb_s["model0"])
    for i in range(1, len(cfg.stage_channels)):
        yield (f"backbone__model{i}", "conv4layer",
               bb_p[f"model{i}"], bb_s[f"model{i}"])
    for i in range(len(cfg.neck_in_channels)):
        yield (f"neck__lateral_convs__{i}", "conv_dp",
               params["neck"]["lateral_convs"][str(i)],
               state["neck"]["lateral_convs"][str(i)])
    hp, hs = params["head"], state["head"]
    nl = len(cfg.strides)
    if "multi_level_share_convs" in hp:
        for lvl in range(nl):
            for j in sorted(hp["multi_level_share_convs"][str(lvl)],
                            key=int):
                yield (f"bbox_head__multi_level_share_convs__{lvl}__{j}",
                       "conv_dp",
                       hp["multi_level_share_convs"][str(lvl)][j],
                       hs["multi_level_share_convs"][str(lvl)][j])
    for branch in ("multi_level_cls", "multi_level_bbox",
                   "multi_level_obj", "multi_level_kps"):
        if branch not in hp:
            continue
        for lvl in range(nl):
            yield (f"bbox_head__{branch}__{lvl}", "conv_dp",
                   hp[branch][str(lvl)], hs[branch][str(lvl)])


def generate_cpp(params, state, cfg: ModelConfig) -> str:
    entries: List[Dict[str, Any]] = []
    for name, kind, p, s in walk_modules(params, state, cfg):
        if kind == "conv_head":
            w2, b2 = fold_conv_bn(p["conv1"]["w"], p["conv1"]["b"],
                                  p["bn1"], s["bn1"])
            entries.append(_serialize(w2, b2, name + "_pw",
                                      depthwise=False, with_bn=True,
                                      first3x3x3=True))
            _emit_conv_dp(entries, p["conv2"], s["conv2"], name + "_dp")
        elif kind == "conv4layer":
            _emit_conv_dp(entries, p["conv1"], s["conv1"], name + "_dp1")
            _emit_conv_dp(entries, p["conv2"], s["conv2"], name + "_dp2")
        elif kind == "conv_dp":
            _emit_conv_dp(entries, p, s, name)

    out = [HEADER]
    for d in entries:
        out.append(f"float {d['weight_name']}[{d['weight_size']}] = "
                   f"{{{d['weight']}}};\n")
        out.append(f"float {d['bias_name']}[{d['bias_size']}] = "
                   f"{{{d['bias']}}};\n")
    out.append("\n//(in_channels, out_channels, is_depthwise, is_pointwise,"
               " with_bn, weight_ptr, bias_ptr)\n")
    out.append(f"ConvInfoStruct param_pConvInfo[{len(entries)}] = {{\n")
    rows = []
    for d in entries:
        def cb(b):
            return "true" if b else "false"
        rows.append(
            f"\t{{{d['in_channels']}, {d['out_channels']}, "
            f"{cb(d['is_dw'])}, {cb(not d['is_dw'])}, {cb(d['with_bn'])}, "
            f"{d['weight_name']}, {d['bias_name']}}}")
    out.append(",\n".join(rows) + "\n};")
    return "".join(out)
