"""ONNX export of YuNet — emitted directly in protobuf wire format.

Mirrors the output contract of the reference exporter
(tools/yunet2onnx.py:89-113 + the in-model export branch
yunet_head.py:227-245): NCHW ``input``, twelve outputs named
{cls,obj,bbox,kps}_{8,16,32} with shape (B, HW, C), sigmoid baked into the
graph for cls/obj, optional dynamic batch/spatial axes. BatchNorm is folded
into the convolutions at export time (the reference reaches the same state
via onnxsim, yunet2onnx.py:126-147).

No onnx/onnxruntime dependency: the ModelProto is assembled with the
minimal protobuf codec in proto.py and validated by round-trip through
onnx_reader + a numerical-parity interpreter in tests.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import numpy as np

from ..config import ModelConfig
from .cpp_export import fold_conv_bn
from .proto import Message, encode_message, f32


def _attr_int(name: str, v: int) -> bytes:
    return encode_message({1: [name.encode()], 20: [2], 3: [v]})


def _attr_ints(name: str, vs: Sequence[int]) -> bytes:
    return encode_message({1: [name.encode()], 20: [7],
                           8: [int(v) for v in vs]})


def _attr_float(name: str, v: float) -> bytes:
    return encode_message({1: [name.encode()], 20: [1], 2: [f32(v)]})


def _attr_str(name: str, v: str) -> bytes:
    return encode_message({1: [name.encode()], 20: [3], 4: [v.encode()]})


def _node(op: str, inputs: Sequence[str], outputs: Sequence[str],
          name: str = "", attrs: Sequence[bytes] = ()) -> bytes:
    msg: Message = {1: [i.encode() for i in inputs],
                    2: [o.encode() for o in outputs],
                    4: [op.encode()]}
    if name:
        msg[3] = [name.encode()]
    if attrs:
        msg[5] = list(attrs)
    return encode_message(msg)


def _tensor(name: str, arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr)
    dt = {np.dtype(np.float32): 1, np.dtype(np.int64): 7}[arr.dtype]
    return encode_message({
        1: [int(d) for d in arr.shape],
        2: [dt], 8: [name.encode()], 9: [arr.tobytes()]})


def _value_info(name: str, shape: Sequence[Any], elem: int = 1) -> bytes:
    dims = []
    for d in shape:
        if isinstance(d, str):
            dims.append(encode_message({2: [d.encode()]}))
        else:
            dims.append(encode_message({1: [int(d)]}))
    shape_msg = encode_message({1: dims})
    ttype = encode_message({1: [elem], 2: [shape_msg]})
    return encode_message({1: [name.encode()],
                           2: [encode_message({1: [ttype]})]})


class _GraphBuilder:
    def __init__(self):
        self.nodes: List[bytes] = []
        self.inits: List[bytes] = []
        self.n = 0

    def fresh(self, stem: str) -> str:
        self.n += 1
        return f"{stem}_{self.n}"

    def const(self, stem: str, arr: np.ndarray) -> str:
        name = self.fresh(stem)
        self.inits.append(_tensor(name, arr))
        return name

    def conv(self, x: str, w_hwio: np.ndarray, b: np.ndarray, *,
             stride: int = 1, pad: int = 0, groups: int = 1,
             stem: str = "conv") -> str:
        w_oihw = np.transpose(np.asarray(w_hwio, np.float32), (3, 2, 0, 1))
        wn = self.const(stem + "_w", w_oihw)
        bn = self.const(stem + "_b", np.asarray(b, np.float32))
        out = self.fresh(stem)
        kh, kw = w_oihw.shape[2], w_oihw.shape[3]
        self.nodes.append(_node(
            "Conv", [x, wn, bn], [out], name=out, attrs=[
                _attr_ints("dilations", [1, 1]),
                _attr_int("group", groups),
                _attr_ints("kernel_shape", [kh, kw]),
                _attr_ints("pads", [pad, pad, pad, pad]),
                _attr_ints("strides", [stride, stride])]))
        return out

    def relu(self, x: str) -> str:
        out = self.fresh("relu")
        self.nodes.append(_node("Relu", [x], [out], name=out))
        return out

    def maxpool2(self, x: str) -> str:
        out = self.fresh("pool")
        self.nodes.append(_node("MaxPool", [x], [out], name=out, attrs=[
            _attr_ints("kernel_shape", [2, 2]),
            _attr_ints("strides", [2, 2]),
            _attr_ints("pads", [0, 0, 0, 0])]))
        return out

    def upsample2(self, x: str) -> str:
        roi = self.const("roi", np.zeros((0,), np.float32))
        scales = self.const("scales",
                            np.asarray([1, 1, 2, 2], np.float32))
        out = self.fresh("up")
        self.nodes.append(_node("Resize", [x, roi, scales], [out],
                                name=out, attrs=[
            _attr_str("coordinate_transformation_mode", "asymmetric"),
            _attr_str("mode", "nearest"),
            _attr_str("nearest_mode", "floor")]))
        return out

    def add(self, a: str, b: str) -> str:
        out = self.fresh("add")
        self.nodes.append(_node("Add", [a, b], [out], name=out))
        return out

    def head_out(self, x: str, ch: int, out_name: str,
                 sigmoid: bool) -> None:
        t = self.fresh("tr")
        self.nodes.append(_node("Transpose", [x], [t], name=t, attrs=[
            _attr_ints("perm", [0, 2, 3, 1])]))
        shape = self.const("shape", np.asarray([0, -1, ch], np.int64))
        if sigmoid:
            r = self.fresh("rs")
            self.nodes.append(_node("Reshape", [t, shape], [r], name=r))
            self.nodes.append(_node("Sigmoid", [r], [out_name],
                                    name=out_name))
        else:
            self.nodes.append(_node("Reshape", [t, shape], [out_name],
                                    name=out_name))


def _conv_dp(g: _GraphBuilder, x: str, p, s, stem: str) -> str:
    x = g.conv(x, p["conv1"]["w"], p["conv1"]["b"], stem=stem + "_pw")
    co = np.asarray(p["conv2"]["w"]).shape[-1]
    if "bn" in p:
        w2, b2 = fold_conv_bn(p["conv2"]["w"], p["conv2"]["b"],
                              p["bn"], s["bn"])
        x = g.conv(x, w2, b2, pad=1, groups=co, stem=stem + "_dw")
        return g.relu(x)
    return g.conv(x, p["conv2"]["w"], p["conv2"]["b"], pad=1, groups=co,
                  stem=stem + "_dw")


def export_onnx(params, state, cfg: ModelConfig, *,
                input_shape: Tuple[int, int] = (640, 640),
                dynamic: bool = False) -> bytes:
    """Build the ONNX ModelProto bytes."""
    g = _GraphBuilder()
    x = "input"

    bb_p, bb_s = params["backbone"], state["backbone"]
    # stem (Conv_head)
    p0, s0 = bb_p["model0"], bb_s["model0"]
    w2, b2 = fold_conv_bn(p0["conv1"]["w"], p0["conv1"]["b"],
                          p0["bn1"], s0["bn1"])
    x = g.relu(g.conv(x, w2, b2, stride=2, pad=1, stem="stem"))
    x = _conv_dp(g, x, p0["conv2"], s0["conv2"], "stem_dp")

    feats: List[str] = []
    num_stages = len(cfg.stage_channels)
    for i in range(num_stages):
        if i > 0:
            p, s = bb_p[f"model{i}"], bb_s[f"model{i}"]
            x = _conv_dp(g, x, p["conv1"], s["conv1"], f"m{i}a")
            x = _conv_dp(g, x, p["conv2"], s["conv2"], f"m{i}b")
        if i in cfg.out_idx:
            feats.append(x)
        if i in cfg.downsample_idx:
            x = g.maxpool2(x)

    # TFPN top-down
    np_, ns_ = params["neck"]["lateral_convs"], state["neck"][
        "lateral_convs"]
    for i in range(len(feats) - 1, 0, -1):
        feats[i] = _conv_dp(g, feats[i], np_[str(i)], ns_[str(i)],
                            f"lat{i}")
        feats[i - 1] = g.add(feats[i - 1], g.upsample2(feats[i]))
    feats[0] = _conv_dp(g, feats[0], np_["0"], ns_["0"], "lat0")

    # head
    hp, hs = params["head"], state["head"]
    outs: Dict[str, List[str]] = {"cls": [], "obj": [], "bbox": [],
                                  "kps": []}
    for lvl, f in enumerate(feats):
        if "multi_level_share_convs" in hp:
            for j in sorted(hp["multi_level_share_convs"][str(lvl)],
                            key=int):
                f = _conv_dp(g, f,
                             hp["multi_level_share_convs"][str(lvl)][j],
                             hs["multi_level_share_convs"][str(lvl)][j],
                             f"share{lvl}_{j}")
        for key, branch in (("cls", "multi_level_cls"),
                            ("bbox", "multi_level_bbox"),
                            ("obj", "multi_level_obj"),
                            ("kps", "multi_level_kps")):
            if branch not in hp:
                continue
            outs[key].append(_conv_dp(
                g, f, hp[branch][str(lvl)], hs[branch][str(lvl)],
                f"{key}{lvl}"))

    h, w = input_shape
    output_infos = []
    kps_ch = None
    for key, sigmoid, ch in (("cls", True, cfg.num_classes),
                             ("obj", True, 1), ("bbox", False, 4),
                             ("kps", False, cfg.kps_num * 2)):
        for lvl, stride in enumerate(cfg.strides):
            name = f"{key}_{stride}"
            g.head_out(outs[key][lvl], ch, name, sigmoid)
            hw = (h // stride) * (w // stride)
            shape = ["batch", "hw", ch] if dynamic else [1, hw, ch]
            output_infos.append(_value_info(name, shape))

    in_shape = (["batch", 3, "height", "width"] if dynamic
                else [1, 3, h, w])
    graph = encode_message({
        1: g.nodes,
        2: [b"yunet_tpu"],
        5: g.inits,
        11: [_value_info("input", in_shape)],
        12: output_infos,
    })
    model = encode_message({
        1: [7],                       # ir_version
        2: [b"yunet_tpu"],            # producer_name
        7: [graph],
        8: [encode_message({1: [b""], 2: [11]})],  # opset 11
    })
    return model
