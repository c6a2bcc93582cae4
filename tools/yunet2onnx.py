#!/usr/bin/env python
"""ONNX export CLI (reference tools/yunet2onnx.py parity).

  python tools/yunet2onnx.py yunet_n ckpt.pth --output yunet_n.onnx \
      --shape 640 640 [--dynamic] [--verify]

Emits the same graph contract as the reference export (12 outputs
{cls,obj,bbox,kps}_{8,16,32}, sigmoid in-graph, BN folded); --verify
executes the emitted file with the bundled interpreter and compares
against the JAX model (atol 1e-5 gate mirroring yunet2onnx.py:203-210).
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
    p.add_argument("--shape", type=int, nargs="+", default=[640, 640])
    p.add_argument("--dynamic", action="store_true")
    p.add_argument("--verify", action="store_true")
    args = p.parse_args(argv)

    # export + verification are host-side work; keep it off the TPU so the
    # f32 verify tolerances hold and eager ops don't pay tunnel latency
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from yunet_tpu.config import get_config
    from yunet_tpu.export import export_onnx, read_onnx
    from detect_image import load_weights

    cfg = get_config(args.config)
    params, state = load_weights(cfg, args.checkpoint)
    h, w = args.shape[0], args.shape[-1]
    blob = export_onnx(params, state, cfg.model, input_shape=(h, w),
                       dynamic=args.dynamic)
    out = args.output or (
        f"{args.config}_{'dynamic' if args.dynamic else f'{h}_{w}'}.onnx")
    with open(out, "wb") as f:
        f.write(blob)
    print(f"wrote {out} ({len(blob) / 1024:.0f} KB)")

    if args.verify:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "tests"))
        import jax.numpy as jnp
        from onnx_interp import run_graph
        from yunet_tpu.models import YuNet

        g = read_onnx(out)
        rng = np.random.RandomState(0)
        vh, vw = (320, 320) if args.dynamic else (h, w)
        img = rng.randint(0, 256, (1, 3, vh, vw)).astype(np.float32)
        got = run_graph(g, {"input": img})
        model = YuNet(cfg.model)
        outs, _ = model.forward(params, state,
                                jnp.asarray(np.transpose(img, (0, 2, 3, 1))),
                                train=False)
        for key, sig in (("cls", True), ("obj", True), ("bbox", False),
                         ("kps", False)):
            for lvl, stride in enumerate((8, 16, 32)):
                m = np.asarray(outs[key][lvl])
                m = m.reshape(1, -1, m.shape[-1])
                if sig:
                    m = 1 / (1 + np.exp(-m.astype(np.float64)))
                np.testing.assert_allclose(
                    got[f"{key}_{stride}"], m.astype(np.float32),
                    rtol=1e-3, atol=1e-5, err_msg=f"{key}_{stride}")
        print("verification passed: onnx outputs match the JAX model")


if __name__ == "__main__":
    main()
