"""TFLite export of YuNet via tf.lite.TFLiteConverter.

The reference converts its torch model with Alibaba TinyNN
(tools/yunet2tflite.py:80-97, default input 1x3x256x320). Here the TF
graph is built directly from our parameter pytree — BatchNorm folded into
the depthwise convolutions exactly as in the C++/ONNX exporters — and
converted from a concrete function. NHWC is both our model's and TFLite's
native layout, so the body has no layout shims; only the graph input is
NCHW (1, 3, H, W) to keep one deployment contract across every engine
(ONNX / C++ / TFLite), with a single Transpose after the input.

Outputs: the standard twelve {cls,obj,bbox,kps}_{8,16,32} tensors of
shape (B, HW, C), sigmoid baked in for cls/obj — identical numerical
contract to export_onnx (tools/yunet2onnx.py:89-113 in the reference).

TensorFlow is imported lazily; everything here is host-side tooling.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..config import ModelConfig
from .cpp_export import fold_conv_bn


def _np(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def _conv(tf, x, w_hwio, b, *, stride: int = 1, pad: int = 0):
    """Plain conv, explicit symmetric padding (matches our lax conv)."""
    if pad:
        x = tf.pad(x, [[0, 0], [pad, pad], [pad, pad], [0, 0]])
    y = tf.nn.conv2d(x, _np(w_hwio), strides=stride, padding="VALID")
    return y + _np(b)


def _dwconv(tf, x, w_hwio, b, *, pad: int = 1):
    """Depthwise 3x3: our HWIO weight is (kh, kw, 1, C); TF wants
    (kh, kw, C, 1)."""
    w = np.transpose(_np(w_hwio), (0, 1, 3, 2))
    if pad:
        x = tf.pad(x, [[0, 0], [pad, pad], [pad, pad], [0, 0]])
    y = tf.nn.depthwise_conv2d(x, w, strides=[1, 1, 1, 1], padding="VALID")
    return y + _np(b)


def _convdp(tf, x, p, s):
    """ConvDPUnit: 1x1 pw -> 3x3 dw (+ folded BN + ReLU when present)."""
    x = _conv(tf, x, p["conv1"]["w"], p["conv1"]["b"])
    if "bn" in p:
        w2, b2 = fold_conv_bn(p["conv2"]["w"], p["conv2"]["b"],
                              p["bn"], s["bn"])
        return tf.nn.relu(_dwconv(tf, x, w2, b2))
    return _dwconv(tf, x, p["conv2"]["w"], p["conv2"]["b"])


def _forward_tf(tf, params, state, cfg: ModelConfig, x):
    """x: (B, H, W, 3) NHWC float32 raw-BGR. Returns dict of 12 outputs."""
    bb_p, bb_s = params["backbone"], state["backbone"]
    p0, s0 = bb_p["model0"], bb_s["model0"]
    w, b = fold_conv_bn(p0["conv1"]["w"], p0["conv1"]["b"],
                        p0["bn1"], s0["bn1"])
    x = tf.nn.relu(_conv(tf, x, w, b, stride=2, pad=1))
    x = _convdp(tf, x, p0["conv2"], s0["conv2"])

    feats = []
    for i in range(len(cfg.stage_channels)):
        if i > 0:
            p, s = bb_p[f"model{i}"], bb_s[f"model{i}"]
            x = _convdp(tf, x, p["conv1"], s["conv1"])
            x = _convdp(tf, x, p["conv2"], s["conv2"])
        if i in cfg.out_idx:
            feats.append(x)
        if i in cfg.downsample_idx:
            x = tf.nn.max_pool2d(x, 2, 2, "VALID")

    np_, ns_ = params["neck"]["lateral_convs"], state["neck"][
        "lateral_convs"]
    for i in range(len(feats) - 1, 0, -1):
        feats[i] = _convdp(tf, feats[i], np_[str(i)], ns_[str(i)])
        up = tf.repeat(tf.repeat(feats[i], 2, axis=1), 2, axis=2)
        feats[i - 1] = feats[i - 1] + up
    feats[0] = _convdp(tf, feats[0], np_["0"], ns_["0"])

    hp, hs = params["head"], state["head"]
    outs = {}
    for lvl, f in enumerate(feats):
        if "multi_level_share_convs" in hp:
            for j in sorted(hp["multi_level_share_convs"][str(lvl)],
                            key=int):
                f = _convdp(tf, f,
                            hp["multi_level_share_convs"][str(lvl)][j],
                            hs["multi_level_share_convs"][str(lvl)][j])
        stride = cfg.strides[lvl]
        for key, branch, ch, sig in (
                ("cls", "multi_level_cls", cfg.num_classes, True),
                ("obj", "multi_level_obj", 1, True),
                ("bbox", "multi_level_bbox", 4, False),
                ("kps", "multi_level_kps", cfg.kps_num * 2, False)):
            y = _convdp(tf, f, hp[branch][str(lvl)], hs[branch][str(lvl)])
            y = tf.reshape(y, (tf.shape(y)[0], -1, ch))
            if sig:
                y = tf.sigmoid(y)
            outs[f"{key}_{stride}"] = y
    return outs


def export_tflite(params, state, cfg: ModelConfig, *,
                  input_shape: Tuple[int, int] = (256, 320),
                  quantize: str = "none",
                  rep_images=None) -> bytes:
    """Build the .tflite flatbuffer bytes. input_shape is (H, W).

    quantize:
      "none"    — float32 weights/activations (reference parity; the
                  reference's TinyNN path is float-only,
                  tools/yunet2tflite.py:87-94 only *points* at
                  quantization examples).
      "dynamic" — dynamic-range PTQ: int8 weights, float activations
                  (~4x smaller file, no calibration needed).
      "fp16"    — float16 weights, float32 compute (2x smaller, near
                  lossless; GPU-delegate friendly).
      "int8"    — full-integer PTQ: int8 weights AND activations,
                  calibrated on ``rep_images`` — an iterable of
                  (1, 3, H, W) float32 raw-BGR arrays (>= ~20
                  recommended). I/O stays float32 so the deployment
                  contract is unchanged; quant/dequant sit at the graph
                  boundary.
    """
    import tensorflow as tf

    h, w = input_shape

    @tf.function(input_signature=[
        tf.TensorSpec([1, 3, h, w], tf.float32, name="input")])
    def fwd(inp):
        x = tf.transpose(inp, (0, 2, 3, 1))  # NCHW contract -> NHWC body
        return _forward_tf(tf, params, state, cfg, x)

    # Route through a SavedModel so the TFLite file carries a SignatureDef
    # (from_concrete_functions drops it, leaving nameless tensor I/O).
    import tempfile

    module = tf.Module()
    module.fwd = fwd
    with tempfile.TemporaryDirectory() as d:
        tf.saved_model.save(module, d,
                            signatures=fwd.get_concrete_function())
        converter = tf.lite.TFLiteConverter.from_saved_model(d)
        if quantize == "dynamic":
            converter.optimizations = [tf.lite.Optimize.DEFAULT]
        elif quantize == "fp16":
            converter.optimizations = [tf.lite.Optimize.DEFAULT]
            converter.target_spec.supported_types = [tf.float16]
        elif quantize == "int8":
            if rep_images is None:
                raise ValueError("int8 quantization needs rep_images")

            def _rep():
                for img in rep_images:
                    yield [np.asarray(img, np.float32).reshape(1, 3, h, w)]

            converter.optimizations = [tf.lite.Optimize.DEFAULT]
            converter.representative_dataset = _rep
        elif quantize != "none":
            raise ValueError(f"unknown quantize mode {quantize!r}")
        return converter.convert()


def run_tflite(blob: bytes, x: np.ndarray) -> dict:
    """Execute a .tflite blob on (1, 3, H, W) float32 input; returns the
    named output dict via the signature runner."""
    import tensorflow as tf

    interp = tf.lite.Interpreter(model_content=blob)
    runner = interp.get_signature_runner()
    out = runner(input=np.asarray(x, np.float32))
    return {k: np.asarray(v) for k, v in out.items()}
