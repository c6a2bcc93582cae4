"""Import YuNet weights from an ONNX file (reference exports or ours).

The exported graphs are BN-folded, so weights map onto the *folded*
inference representation (models/fused.py tree) and drive the fused
Detector directly — letting users run the shipped onnx/*.onnx artifacts
without any .pth.

Both emission orders are handled: the reference/torch trace emits head
branches grouped by branch (share x3, cls x3, bbox x3, obj x3, kps x3 —
yunet_head.py:185-225), ours per level; they are distinguished by the
out-channel signature of the conv sequence.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ..config import ModelConfig
from .onnx_reader import read_onnx


def _conv_params(g, node):
    w = g.initializers[node.inputs[1]]          # OIHW
    b = g.initializers[node.inputs[2]]
    return np.transpose(w, (2, 3, 1, 0)).astype(np.float32), \
        b.astype(np.float32)


def load_onnx_params(path: str, cfg: ModelConfig) -> Dict[str, Any]:
    """Returns a folded-params tree (models/fused.py topology)."""
    g = read_onnx(path)
    convs = [n for n in g.nodes if n.op_type == "Conv"]
    # unit segmentation: first conv is the stem 3x3; then (pw, dw) pairs
    stem = convs[0]
    pairs = [(convs[i], convs[i + 1]) for i in range(1, len(convs), 2)]

    def unit(pw, dw, relu):
        w1, b1 = _conv_params(g, pw)
        wd, bd = _conv_params(g, dw)
        assert w1.shape[:2] == (1, 1), f"expected pointwise, got {w1.shape}"
        assert wd.shape[:3] == (3, 3, 1), f"expected dw, got {wd.shape}"
        return {"w1": w1, "b1": b1, "wd": wd, "bd": bd, "relu": relu}

    out: Dict[str, Any] = {"backbone": {}, "neck": {}, "head": {}}
    w, b = _conv_params(g, stem)
    out["backbone"]["stem_conv"] = {"w": w, "b": b}

    i = 0
    out["backbone"]["stem_dp"] = unit(*pairs[i], True); i += 1
    for s in range(1, len(cfg.stage_channels)):
        out["backbone"][f"m{s}a"] = unit(*pairs[i], True); i += 1
        out["backbone"][f"m{s}b"] = unit(*pairs[i], True); i += 1
    # neck emission order is top-down (lateral 2, 1, 0) in both exporters
    nl = len(cfg.strides)
    for lvl in range(nl - 1, -1, -1):
        out["neck"][str(lvl)] = unit(*pairs[i], True); i += 1

    head_pairs = pairs[i:]
    couts = [p[0].inputs[1] for p in head_pairs]
    couts = [g.initializers[c].shape[0] for c in couts]
    shares = cfg.shared_stacked_convs
    branch_ch = [cfg.num_classes, 4, 1, cfg.kps_num * 2]
    ref_sig = ([cfg.feat_channels] * shares * nl
               + sum(([c] * nl for c in branch_ch), []))
    ours_sig = sum(([cfg.feat_channels] * shares + branch_ch
                    for _ in range(nl)), [])
    lvl_d: Dict[str, Dict] = {str(l): {} for l in range(nl)}
    keys = ["cls", "bbox", "obj", "kps"]
    if couts == ref_sig:
        # torch trace order: all shares (level-major), then branch-major
        k = 0
        for l in range(nl):
            lvl_d[str(l)]["share"] = []
            for _ in range(shares):
                lvl_d[str(l)]["share"].append(unit(*head_pairs[k], True))
                k += 1
        for key in keys:
            for l in range(nl):
                lvl_d[str(l)][key] = unit(*head_pairs[k], False)
                k += 1
    elif couts == ours_sig:
        k = 0
        for l in range(nl):
            lvl_d[str(l)]["share"] = []
            for _ in range(shares):
                lvl_d[str(l)]["share"].append(unit(*head_pairs[k], True))
                k += 1
            for key in keys:
                lvl_d[str(l)][key] = unit(*head_pairs[k], False)
                k += 1
    else:
        raise ValueError(
            f"unrecognized head conv layout: out channels {couts}")
    out["head"] = lvl_d
    return out
