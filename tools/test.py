#!/usr/bin/env python
"""Generic evaluation entry (reference tools/test.py role): run inference
over the val set and report the in-training metric (VOC mAP @0.5 on the
labelv2 annotations), optionally dumping raw results.

  python tools/test.py yunet_n weights.pth --eval mAP
"""

import argparse
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("config", help="yunet_n | yunet_s")
    p.add_argument("checkpoint")
    p.add_argument("--eval", default="mAP", choices=["mAP", "none"])
    p.add_argument("--out", default=None, help="pickle results here")
    p.add_argument("--ann", default=None)
    p.add_argument("--img-prefix", default=None)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--mode", default="(640, 640)",
                   help="detector resize mode")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import ast
    import cv2
    import numpy as np

    from yunet_tpu.config import get_config
    from yunet_tpu.data import parse_labelv2
    from yunet_tpu.eval import Detector
    from yunet_tpu.eval.widerface import eval_map
    from detect_image import load_weights

    cfg = get_config(args.config)
    ann = args.ann or cfg.data.val_ann
    img_prefix = args.img_prefix or cfg.data.val_img_prefix
    params, state = load_weights(cfg, args.checkpoint)
    det = Detector(cfg, params, state)
    try:
        mode = ast.literal_eval(args.mode)
    except (ValueError, SyntaxError):
        mode = args.mode

    records = parse_labelv2(ann, test_mode=True)
    if args.limit:
        records = records[:args.limit]
    dets, anns = [], []
    t0 = time.time()
    for i, rec in enumerate(records):
        img = cv2.imread(os.path.join(img_prefix, rec.filename))
        if img is None:
            raise SystemExit(f"missing {rec.filename}")
        r = det.detect(img, mode=mode)
        dets.append(r["bboxes"])
        anns.append({"bboxes": rec.bboxes,
                     "bboxes_ignore": rec.bboxes_ignore})
        if (i + 1) % 200 == 0:
            print(f"{i + 1}/{len(records)} "
                  f"({(i + 1) / (time.time() - t0):.1f} img/s)")
    if args.out:
        with open(args.out, "wb") as f:
            pickle.dump(dets, f)
        print(f"wrote {args.out}")
    if args.eval == "mAP":
        ap = eval_map(dets, anns, iou_thr=0.5)
        print(f"mAP@0.5: {ap:.4f}")


if __name__ == "__main__":
    main()
