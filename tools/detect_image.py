#!/usr/bin/env python
"""Single-image face detection CLI (reference tools/detect_image.py parity).

  python tools/detect_image.py yunet_n /root/reference/weights/yunet_n.pth \
      photo.jpg --out out.jpg --mode AUTO
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Detect faces in one image")
    p.add_argument("config", help="yunet_n | yunet_s")
    p.add_argument("checkpoint", help=".pth (reference) or orbax ckpt dir")
    p.add_argument("image")
    p.add_argument("--out", default="result.jpg")
    p.add_argument("--mode", default="AUTO",
                   help="ORIGIN | AUTO | VGA | 'W,H'")
    p.add_argument("--score-thresh", type=float, default=0.3)
    p.add_argument("--nms-thresh", type=float, default=0.45)
    p.add_argument("--device-nms", action="store_true",
                   help="run NMS on the TPU instead of the host")
    p.add_argument("--fused", action="store_true",
                   help="BN-folded trunk with the fused Pallas kernel")
    p.add_argument("--no-kps", action="store_true")
    return p.parse_args(argv)


def load_weights(cfg, path):
    if os.path.isdir(path):
        from yunet_tpu.train.step import init_train_state
        from yunet_tpu.train.checkpoint import load_checkpoint
        ts, _ = init_train_state(cfg, steps_per_epoch=1, total_batch=1)
        ts, _ = load_checkpoint(path, ts)
        return ts.params, ts.state
    from yunet_tpu.utils import load_pth_params
    return load_pth_params(
        path, shared_stacked_convs=cfg.model.shared_stacked_convs)


def main(argv=None):
    args = parse_args(argv)
    import cv2
    import dataclasses

    from yunet_tpu.config import get_config
    from yunet_tpu.eval import Detector

    cfg = get_config(args.config)
    cfg = dataclasses.replace(cfg, test=dataclasses.replace(
        cfg.test, score_thr=args.score_thresh,
        nms_iou_thr=args.nms_thresh))
    params, state = load_weights(cfg, args.checkpoint)
    det = Detector(cfg, params, state, fused=args.fused)

    img = cv2.imread(args.image)
    if img is None:
        raise SystemExit(f"cannot read image: {args.image}")
    result = det.detect(img, mode=args.mode,
                        use_device_nms=args.device_nms)
    boxes, kps = result["bboxes"], result["kps"]
    print(f"{boxes.shape[0]} faces")
    for i in range(boxes.shape[0]):
        x1, y1, x2, y2 = boxes[i, :4].astype(int)
        cv2.rectangle(img, (x1, y1), (x2, y2), (0, 0, 255), 2)
        if not args.no_kps:
            for k in range(kps.shape[1] // 2):
                pt = kps[i, 2 * k:2 * k + 2].astype(int)
                cv2.circle(img, tuple(pt), 1, (255, 0, 0), 2)
        print(f"  [{x1} {y1} {x2} {y2}] score {boxes[i, 4]:.3f}")
    cv2.imwrite(args.out, img)
    print("output:", args.out)


if __name__ == "__main__":
    main()
