#!/usr/bin/env python
"""TFLite export (reference tools/yunet2tflite.py surface).

The reference converts its torch model with Alibaba TinyNN at input
1x3x256x320 (yunet2tflite.py:80-97). Here the TF graph is built directly
from our parameter pytree (BN folded) and converted with
tf.lite.TFLiteConverter; --verify executes the flatbuffer with
tf.lite.Interpreter and checks numerical parity against the JAX model.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rep_images(h, w, img_dir=None, count=32):
    """Calibration batches (1, 3, H, W) float32 raw-BGR for int8 PTQ.

    From a directory of images (letterboxed like the serving path) when
    given, else synthetic face renders (tools/make_synth_wider.py) —
    activation ranges are set by face-like content, not noise.
    """
    import numpy as np

    if img_dir:
        import glob

        import cv2
        paths = sorted(
            p for p in glob.glob(os.path.join(img_dir, "**", "*"),
                                 recursive=True)
            if p.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")))
        if not paths:
            raise SystemExit(f"no images under {img_dir}")
        for p in paths[:count]:
            img = cv2.imread(p)
            if img is None:
                continue
            s = min(w / img.shape[1], h / img.shape[0])
            rs = cv2.resize(img, (max(1, int(img.shape[1] * s)),
                                  max(1, int(img.shape[0] * s))))
            canvas = np.zeros((h, w, 3), np.uint8)
            canvas[:rs.shape[0], :rs.shape[1]] = rs
            yield np.transpose(canvas.astype(np.float32), (2, 0, 1))[None]
        return
    from make_synth_wider import make_image
    rng = np.random.RandomState(7)
    for _ in range(count):
        img = make_image(rng, w, h)[0]
        yield np.transpose(img.astype(np.float32), (2, 0, 1))[None]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("config", help="yunet_n | yunet_s")
    p.add_argument("checkpoint")
    p.add_argument("--output", default=None)
    p.add_argument("--shape", type=int, nargs="+", default=[256, 320],
                   help="H W (reference default 256x320)")
    p.add_argument("--verify", action="store_true",
                   help="run the .tflite and compare against the JAX model")
    p.add_argument("--quantize",
                   choices=["none", "fp16", "dynamic", "int8"],
                   default="none",
                   help="post-training quantization: fp16 weights, "
                   "dynamic-range (int8 weights), or full-integer "
                   "(int8 weights + activations, calibrated)")
    p.add_argument("--rep-images", default=None,
                   help="directory of calibration images for --quantize "
                   "int8 (default: 32 synthetic face renders)")
    p.add_argument("--rep-count", type=int, default=32)
    args = p.parse_args(argv)

    try:
        import tensorflow  # noqa: F401
    except ImportError:
        print("tensorflow is not installed; cannot convert. "
              "Use tools/yunet2onnx.py + onnx2tf on a machine with TF.")
        return 1

    import jax
    jax.config.update("jax_platforms", "cpu")  # host-side tooling

    from yunet_tpu.config import get_config
    from yunet_tpu.export.tflite_export import export_tflite, run_tflite
    from detect_image import load_weights

    cfg = get_config(args.config)
    params, state = load_weights(cfg, args.checkpoint)
    h, w = args.shape[0], args.shape[-1]
    out_path = args.output or f"{args.config}_{w}x{h}.tflite"
    rep = None
    if args.quantize == "int8":
        rep = list(rep_images(h, w, args.rep_images, args.rep_count))
        print(f"calibrating int8 on {len(rep)} images")
    blob = export_tflite(params, state, cfg.model, input_shape=(h, w),
                         quantize=args.quantize, rep_images=rep)
    with open(out_path, "wb") as f:
        f.write(blob)
    print(f"wrote {out_path} ({len(blob) // 1024} KB, "
          f"quantize={args.quantize})")

    if args.verify:
        import numpy as np
        import jax.numpy as jnp
        from yunet_tpu.models import YuNet

        rng = np.random.RandomState(0)
        if args.quantize == "none":
            img = rng.randint(0, 256, (1, 3, h, w)).astype(np.float32)
        else:
            # verify quantized models on in-distribution content
            from make_synth_wider import make_image
            face = make_image(rng, w, h)[0]
            img = np.transpose(face.astype(np.float32), (2, 0, 1))[None]
        got = run_tflite(blob, img)
        model = YuNet(cfg.model)
        outs, _ = model.forward(
            params, state, jnp.asarray(np.transpose(img, (0, 2, 3, 1))),
            train=False)
        for key, sig in (("cls", True), ("obj", True), ("bbox", False),
                         ("kps", False)):
            gots, wants = [], []
            for lvl, stride in enumerate(cfg.model.strides):
                m = np.asarray(outs[key][lvl])
                m = m.reshape(m.shape[0], -1, m.shape[-1])
                if sig:
                    m = 1.0 / (1.0 + np.exp(-m.astype(np.float64)))
                k = f"{key}_{stride}"
                if args.quantize == "none":
                    np.testing.assert_allclose(got[k], m, rtol=1e-3,
                                               atol=1e-4, err_msg=k)
                else:
                    gots.append(got[k].ravel())
                    wants.append(m.ravel())
            if args.quantize != "none":
                # int8/dynamic PTQ: correlation gate over all levels of
                # the branch (per-level maps can be as small as 12
                # values) + a loose bound for the sigmoid-squashed maps
                a = np.concatenate(gots)
                b = np.concatenate(wants)
                cc = float(np.corrcoef(a, b)[0, 1])
                assert cc > 0.97, f"{key}: corr {cc:.4f}"
                if sig:
                    err = float(np.abs(a - b).max())
                    assert err < 0.2, f"{key}: max sigmoid err {err:.3f}"
        print("verification passed: tflite outputs match the JAX model"
              + ("" if args.quantize == "none"
                 else " (quantized, correlation gate)"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
