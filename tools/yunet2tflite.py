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


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("config", help="yunet_n | yunet_s")
    p.add_argument("checkpoint")
    p.add_argument("--output", default=None)
    p.add_argument("--shape", type=int, nargs="+", default=[256, 320],
                   help="H W (reference default 256x320)")
    p.add_argument("--verify", action="store_true",
                   help="run the .tflite and compare against the JAX model")
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
    blob = export_tflite(params, state, cfg.model, input_shape=(h, w))
    with open(out_path, "wb") as f:
        f.write(blob)
    print(f"wrote {out_path} ({len(blob) // 1024} KB)")

    if args.verify:
        import numpy as np
        import jax.numpy as jnp
        from yunet_tpu.models import YuNet

        rng = np.random.RandomState(0)
        img = rng.randint(0, 256, (1, 3, h, w)).astype(np.float32)
        got = run_tflite(blob, img)
        model = YuNet(cfg.model)
        outs, _ = model.forward(
            params, state, jnp.asarray(np.transpose(img, (0, 2, 3, 1))),
            train=False)
        for key, sig in (("cls", True), ("obj", True), ("bbox", False),
                         ("kps", False)):
            for lvl, stride in enumerate(cfg.model.strides):
                m = np.asarray(outs[key][lvl])
                m = m.reshape(m.shape[0], -1, m.shape[-1])
                if sig:
                    m = 1.0 / (1.0 + np.exp(-m.astype(np.float64)))
                k = f"{key}_{stride}"
                np.testing.assert_allclose(got[k], m, rtol=1e-3, atol=1e-4,
                                           err_msg=k)
        print("verification passed: tflite outputs match the JAX model")
    return 0


if __name__ == "__main__":
    sys.exit(main())
