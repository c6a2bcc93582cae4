#!/usr/bin/env python
"""Quantization AP study: float vs fp16/dynamic/int8 TFLite artifacts
through the full WIDER protocol on the synthetic val set.

Extends the AP-level export-drift gate (reference
tools/compare_inference.py:744+ onnx_eval) to the quantized deployment
artifacts: every engine letterboxes to the artifact's static input,
decodes through the same independent numpy path, and is scored by
wider_evaluation against the official-format GT .mat files — so the
float-vs-quantized AP delta is measured, not asserted.

  python tools/misc/quant_ap_study.py \
      --ckpt work_dirs/rehearsal/ckpt_00002400 \
      --data data/synth_wider/val --shape 640 640

Writes the table to stdout (markdown) for COMPONENTS.md.
"""

import argparse
import dataclasses
import os
import sys
import tempfile
from types import SimpleNamespace

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tools"))


def load_ema_params(ckpt, cfg):
    """Restore the rehearsal checkpoint, preferring the EMA shadow —
    the parameters the eval hook and every published synth AP used."""
    from yunet_tpu.train.checkpoint import load_checkpoint
    from yunet_tpu.train.step import init_train_state

    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, ema_momentum=0.9998))  # template must carry ema leaves
    ts, _ = init_train_state(cfg, steps_per_epoch=1, total_batch=1)
    ts, meta = load_checkpoint(ckpt, ts)
    params = ts.ema_params if ts.ema_params is not None else ts.params
    return params, ts.state, meta


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", default="work_dirs/rehearsal/ckpt_00002400")
    p.add_argument("--data", default="data/synth_wider/val")
    p.add_argument("--config", default="yunet_n")
    p.add_argument("--shape", type=int, nargs=2, default=[640, 640],
                   help="H W static export shape")
    p.add_argument("--modes", nargs="+",
                   default=["none", "fp16", "dynamic", "int8"])
    p.add_argument("--limit", type=int, default=0,
                   help="0 = all (the .mat GT requires predictions for "
                   "every val image; use a limit only with a matching "
                   "GT subset)")
    p.add_argument("--rep-count", type=int, default=32)
    p.add_argument("--score-thr", type=float, default=0.02)
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")  # host-side study

    import compare_inference as ci
    from yunet2tflite import rep_images
    from yunet_tpu.config import get_config
    from yunet_tpu.export.onnx_export import export_onnx
    from yunet_tpu.export.tflite_export import export_tflite

    cfg = get_config(args.config)
    params, state, meta = load_ema_params(
        os.path.abspath(args.ckpt), cfg)
    print(f"checkpoint {args.ckpt} (step {meta.get('step', '?')}, "
          f"EMA params)")
    h, w = args.shape

    ev = SimpleNamespace(
        ann=os.path.join(args.data, "labelv2.txt"),
        img_prefix=os.path.join(args.data, "images"),
        gt_dir=os.path.join(args.data, "gt"),
        mode=None, limit=args.limit)

    rows = []
    with tempfile.TemporaryDirectory() as d:
        onnx_p = os.path.join(d, "m.onnx")
        with open(onnx_p, "wb") as f:
            f.write(export_onnx(params, state, cfg.model,
                                input_shape=(h, w)))
        eng = ci.build_engine(f"onnx:{onnx_p}", score_thr=args.score_thr)
        aps = ci.run_eval(eng, "onnx float32 (anchor)", ev)
        rows.append(("onnx float32", os.path.getsize(onnx_p), aps))

        cal = None
        for mode in args.modes:
            if mode == "int8" and cal is None:
                train_imgs = os.path.join(
                    os.path.dirname(args.data.rstrip("/")),
                    "train", "images")
                cal = list(rep_images(
                    h, w, train_imgs if os.path.isdir(train_imgs)
                    else None, args.rep_count))
                print(f"int8 calibration: {len(cal)} images "
                      f"({'train split' if os.path.isdir(train_imgs) else 'synthetic renders'})")
            tp = os.path.join(d, f"m_{mode}.tflite")
            with open(tp, "wb") as f:
                f.write(export_tflite(
                    params, state, cfg.model, input_shape=(h, w),
                    quantize=mode, rep_images=cal))
            eng = ci.build_engine(f"tflite:{tp}", score_thr=args.score_thr)
            aps = ci.run_eval(eng, f"tflite {mode}", ev)
            rows.append((f"tflite {mode}", os.path.getsize(tp), aps))

    print(f"\n| artifact ({w}x{h} letterbox) | KB | AP easy | AP medium "
          "| AP hard |")
    print("|---|---|---|---|---|")
    for name, size, aps in rows:
        print(f"| {name} | {size // 1024} | {aps[0]:.4f} | {aps[1]:.4f} "
              f"| {aps[2]:.4f} |")
    return rows


if __name__ == "__main__":
    main()
