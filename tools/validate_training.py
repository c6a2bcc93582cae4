#!/usr/bin/env python
"""End-to-end training validation: overfit a tiny synthetic face dataset
and verify the trained detector localizes every face.

Proves the full loop (SimOTA assignment -> losses -> gradients -> BN ->
decode -> NMS) without requiring WIDER Face images. Used manually and by
the slow test suite:

  python tools/validate_training.py --steps 600
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_face(img, cx, cy, s, rng):
    """Draw a crude synthetic 'face'; returns (bbox, kps (5,3))."""
    import cv2

    x1, y1 = int(cx - s / 2), int(cy - s / 2)
    x2, y2 = int(cx + s / 2), int(cy + s / 2)
    cv2.ellipse(img, (int(cx), int(cy)), (int(s * 0.45), int(s * 0.5)),
                0, 0, 360, (140, 170, 210), -1)
    eye_y = cy - s * 0.15
    kps = []
    for dx in (-s * 0.2, s * 0.2):
        cv2.circle(img, (int(cx + dx), int(eye_y)), max(1, int(s * 0.07)),
                   (20, 20, 30), -1)
        kps.append((cx + dx, eye_y))
    kps.append((cx, cy + s * 0.05))  # nose
    cv2.circle(img, (int(cx), int(cy + s * 0.05)), max(1, int(s * 0.05)),
               (60, 80, 120), -1)
    mouth_y = cy + s * 0.28
    for dx in (-s * 0.15, s * 0.15):
        kps.append((cx + dx, mouth_y))
    cv2.line(img, (int(cx - s * 0.15), int(mouth_y)),
             (int(cx + s * 0.15), int(mouth_y)), (40, 40, 70), 2)
    bbox = [x1, y1, x2, y2]
    return bbox, [(x, y, 1.0) for x, y in kps]


def make_dataset(n_imgs, img_size, rng, max_gts):
    imgs, bboxes, kpss, valids = [], [], [], []
    for _ in range(n_imgs):
        img = np.full((img_size, img_size, 3),
                      rng.randint(40, 90), np.uint8)
        noise = rng.randint(0, 30, img.shape).astype(np.uint8)
        img = img + noise
        n = rng.randint(2, 5)
        bb = np.zeros((max_gts, 4), np.float32)
        kk = np.zeros((max_gts, 5, 3), np.float32)
        placed = 0
        for _ in range(n):
            s = rng.uniform(24, 56)
            cx = rng.uniform(s, img_size - s)
            cy = rng.uniform(s, img_size - s)
            # avoid heavy overlap with already-placed faces
            ok = all(abs(cx - bb[j, 0:2].mean()) + abs(cy - bb[j, 1]) > s
                     for j in range(placed)) if placed else True
            if not ok:
                continue
            box, kps = make_face(img, cx, cy, s, rng)
            bb[placed] = box
            kk[placed] = kps
            placed += 1
        imgs.append(img.astype(np.float32))
        bboxes.append(bb)
        kpss.append(kk)
        valids.append(np.arange(max_gts) < placed)
    return (np.stack(imgs), np.stack(bboxes), np.stack(kpss),
            np.stack(valids))


def run(steps=600, img_size=160, n_imgs=8, seed=0, verbose=True):
    import dataclasses
    import jax.numpy as jnp

    from yunet_tpu.config import yunet_n
    from yunet_tpu.eval import Detector
    from yunet_tpu.models import YuNet
    from yunet_tpu.train import init_train_state, make_train_step

    rng = np.random.RandomState(seed)
    max_gts = 8
    imgs, bbs, kks, vals = make_dataset(n_imgs, img_size, rng, max_gts)
    batch = {
        "image": jnp.asarray(imgs),
        "gt_bboxes": jnp.asarray(bbs),
        "gt_labels": jnp.zeros((n_imgs, max_gts), jnp.int32),
        "gt_kps": jnp.asarray(kks),
        "gt_valid": jnp.asarray(vals),
    }
    cfg = yunet_n()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, img_size=img_size,
                                 max_gts=max_gts),
        train=dataclasses.replace(cfg.train, lr=0.005, warmup_iters=100,
                                  lr_decay_epochs=(10 ** 9,)))
    model = YuNet(cfg.model)
    ts, tx = init_train_state(cfg, steps_per_epoch=10 ** 6,
                              total_batch=n_imgs)
    step = make_train_step(cfg, model, tx, img_size=img_size)
    for i in range(steps):
        ts, m = step(ts, batch)
        if verbose and (i + 1) % 100 == 0:
            print(f"step {i + 1}: loss {float(m['loss']):.3f} "
                  f"(bbox {float(m['loss_bbox']):.3f} "
                  f"obj {float(m['loss_obj']):.3f}) "
                  f"num_pos {float(m['num_pos']):.0f}", flush=True)

    det = Detector(cfg, ts.params, ts.state, bf16=False)
    matched, total, kps_err = 0, 0, []
    for i in range(n_imgs):
        r = det.detect(imgs[i].astype(np.uint8), mode="AUTO",
                       score_thr=0.3)
        gt = bbs[i][vals[i]]
        gt_kps = kks[i][vals[i]]
        total += gt.shape[0]
        for g in range(gt.shape[0]):
            if r["bboxes"].shape[0] == 0:
                continue
            x1 = np.maximum(r["bboxes"][:, 0], gt[g, 0])
            y1 = np.maximum(r["bboxes"][:, 1], gt[g, 1])
            x2 = np.minimum(r["bboxes"][:, 2], gt[g, 2])
            y2 = np.minimum(r["bboxes"][:, 3], gt[g, 3])
            inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
            a1 = ((r["bboxes"][:, 2] - r["bboxes"][:, 0])
                  * (r["bboxes"][:, 3] - r["bboxes"][:, 1]))
            a2 = (gt[g, 2] - gt[g, 0]) * (gt[g, 3] - gt[g, 1])
            iou = inter / np.maximum(a1 + a2 - inter, 1e-9)
            j = int(iou.argmax())
            if iou[j] >= 0.5:
                matched += 1
                pred_kp = r["kps"][j].reshape(5, 2)
                kps_err.append(np.abs(pred_kp
                                      - gt_kps[g, :, :2]).mean())
    recall = matched / max(total, 1)
    mean_kp_err = float(np.mean(kps_err)) if kps_err else float("inf")
    if verbose:
        print(f"overfit recall@IoU0.5: {recall:.3f} ({matched}/{total}); "
              f"mean kps error {mean_kp_err:.1f}px")
    return recall, mean_kp_err


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--img-size", type=int, default=160)
    args = p.parse_args()
    recall, kp_err = run(steps=args.steps, img_size=args.img_size)
    if recall < 0.9:
        raise SystemExit(f"FAIL: recall {recall:.3f} < 0.9")
    print("PASS")
