"""Extended augmentation library (available but not in the shipped recipe,
matching the reference's pipeline library surface —
datasets/pipelines/transforms.py:1211+, auto_augment.py):

  photometric_distortion  — brightness/contrast/saturation/hue jitter
                            (reference PhotoMetricDistortion semantics:
                            random order of contrast, BGR<->HSV hops)
  expand                  — paste into a larger mean-filled canvas
  min_iou_random_crop     — IoU-constrained crop (keypoint-aware)
  mosaic4                 — 4-image mosaic with keypoint support
                            (the reference extended Mosaic for keypoints,
                            transforms.py:2279-2419)

All functions are pure numpy host-side transforms over
(img f32 BGR, bboxes (n,4), kps (n,K,3)) and keep the framework's
fixed-shape batch contract downstream.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def photometric_distortion(img: np.ndarray, rng: np.random.RandomState, *,
                           brightness_delta: float = 32,
                           contrast_range: Tuple[float, float] = (0.5, 1.5),
                           saturation_range: Tuple[float, float] = (0.5,
                                                                    1.5),
                           hue_delta: float = 18) -> np.ndarray:
    import cv2

    img = img.astype(np.float32).copy()
    if rng.randint(2):
        img += rng.uniform(-brightness_delta, brightness_delta)
    contrast_first = rng.randint(2)
    if contrast_first and rng.randint(2):
        img *= rng.uniform(*contrast_range)
    hsv = cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8),
                       cv2.COLOR_BGR2HSV).astype(np.float32)
    if rng.randint(2):
        hsv[..., 1] *= rng.uniform(*saturation_range)
    if rng.randint(2):
        hsv[..., 0] = (hsv[..., 0] + rng.uniform(-hue_delta, hue_delta)) \
            % 180
    img = cv2.cvtColor(np.clip(hsv, 0, 255).astype(np.uint8),
                       cv2.COLOR_HSV2BGR).astype(np.float32)
    if not contrast_first and rng.randint(2):
        img *= rng.uniform(*contrast_range)
    return np.clip(img, 0, 255)


def expand(img: np.ndarray, bboxes: np.ndarray, kps: np.ndarray,
           rng: np.random.RandomState, *,
           mean: Sequence[float] = (0.0, 0.0, 0.0),
           ratio_range: Tuple[float, float] = (1.0, 4.0)):
    h, w = img.shape[:2]
    ratio = rng.uniform(*ratio_range)
    nh, nw = int(h * ratio), int(w * ratio)
    top = rng.randint(0, nh - h + 1)
    left = rng.randint(0, nw - w + 1)
    canvas = np.empty((nh, nw, 3), img.dtype)
    canvas[...] = np.asarray(mean, img.dtype)
    canvas[top:top + h, left:left + w] = img
    bboxes = bboxes + np.tile([left, top], 2).astype(np.float32)
    kps = kps.copy()
    if kps.size:
        kps[..., 0] += left
        kps[..., 1] += top
    return canvas, bboxes, kps


def min_iou_random_crop(img: np.ndarray, bboxes: np.ndarray,
                        kps: np.ndarray, labels: np.ndarray,
                        rng: np.random.RandomState, *,
                        min_ious: Sequence[float] = (0.1, 0.3, 0.5, 0.7,
                                                     0.9),
                        min_crop_size: float = 0.3, max_tries: int = 50):
    """IoU-constrained crop keeping center-inside boxes (keypoint-aware)."""
    h, w = img.shape[:2]
    choices = (1.0,) + tuple(min_ious)
    while True:
        min_iou = float(rng.choice(choices))
        if min_iou == 1.0:
            return img, bboxes, kps, labels
        for _ in range(max_tries):
            cw = rng.uniform(min_crop_size * w, w)
            ch = rng.uniform(min_crop_size * h, h)
            if ch / cw < 0.5 or ch / cw > 2:
                continue
            left = rng.uniform(0, w - cw)
            top = rng.uniform(0, h - ch)
            patch = np.asarray([left, top, left + cw, top + ch])
            if bboxes.shape[0]:
                lt = np.maximum(bboxes[:, :2], patch[:2])
                rb = np.minimum(bboxes[:, 2:], patch[2:])
                wh = np.clip(rb - lt, 0, None)
                inter = wh[:, 0] * wh[:, 1]
                area = ((bboxes[:, 2] - bboxes[:, 0]) *
                        (bboxes[:, 3] - bboxes[:, 1]))
                iou = inter / np.maximum(area, 1e-9)
                if iou.min() < min_iou:
                    continue
                c = (bboxes[:, :2] + bboxes[:, 2:]) / 2
                mask = ((c[:, 0] > patch[0]) & (c[:, 1] > patch[1])
                        & (c[:, 0] < patch[2]) & (c[:, 1] < patch[3]))
                if not mask.any():
                    continue
            else:
                mask = np.zeros((0,), bool)
            patch_i = patch.astype(np.int64)
            new_img = img[patch_i[1]:patch_i[3], patch_i[0]:patch_i[2]]
            nb = bboxes[mask].copy()
            nk = kps[mask].copy()
            nl = labels[mask]
            if nb.size:
                nb[:, :2] = np.maximum(nb[:, :2], patch[:2])
                nb[:, 2:] = np.minimum(nb[:, 2:], patch[2:])
                nb -= np.tile(patch[:2], 2)
            if nk.size:
                nk[..., 0] = np.clip(nk[..., 0], patch[0],
                                     patch[2]) - patch[0]
                nk[..., 1] = np.clip(nk[..., 1], patch[1],
                                     patch[3]) - patch[1]
            return new_img, nb.astype(np.float32), nk, nl


def mosaic4(samples, rng: np.random.RandomState, *, out_size: int = 1280,
            center_ratio: Tuple[float, float] = (0.5, 1.5),
            pad_val: float = 114.0):
    """Stitch 4 (img, bboxes, kps) samples into one mosaic canvas with
    keypoint handling (kps visibility zeroed when clipped out)."""
    s = out_size // 2
    canvas = np.full((out_size, out_size, 3), pad_val, np.float32)
    cx = int(rng.uniform(*center_ratio) * s)
    cy = int(rng.uniform(*center_ratio) * s)
    all_b, all_k = [], []
    locs = ["tl", "tr", "bl", "br"]
    for loc, (img, bboxes, kps) in zip(locs, samples):
        h, w = img.shape[:2]
        scale = min(2 * s / max(h, w), 1.0) if max(h, w) > 2 * s else 1.0
        if scale != 1.0:
            import cv2
            img = cv2.resize(img, (int(w * scale), int(h * scale)))
            h, w = img.shape[:2]
            bboxes = bboxes * scale
            kps = kps.copy()
            kps[..., :2] *= scale
        if loc == "tl":
            x1, y1 = max(cx - w, 0), max(cy - h, 0)
            x2, y2 = cx, cy
            sx, sy = w - (x2 - x1), h - (y2 - y1)
        elif loc == "tr":
            x1, y1 = cx, max(cy - h, 0)
            x2, y2 = min(cx + w, out_size), cy
            sx, sy = 0, h - (y2 - y1)
        elif loc == "bl":
            x1, y1 = max(cx - w, 0), cy
            x2, y2 = cx, min(cy + h, out_size)
            sx, sy = w - (x2 - x1), 0
        else:
            x1, y1 = cx, cy
            x2, y2 = min(cx + w, out_size), min(cy + h, out_size)
            sx, sy = 0, 0
        canvas[y1:y2, x1:x2] = img[sy:sy + (y2 - y1), sx:sx + (x2 - x1)]
        dx, dy = x1 - sx, y1 - sy
        if bboxes.shape[0]:
            b = bboxes + np.tile([dx, dy], 2).astype(np.float32)
            k = kps.copy()
            k[..., 0] += dx
            k[..., 1] += dy
            # keep boxes whose centers are on the canvas
            c = (b[:, :2] + b[:, 2:]) / 2
            mask = ((c[:, 0] > 0) & (c[:, 1] > 0)
                    & (c[:, 0] < out_size) & (c[:, 1] < out_size))
            b = np.clip(b[mask], 0, out_size)
            k = k[mask]
            if k.size:
                out = ((k[..., 0] < 0) | (k[..., 0] > out_size)
                       | (k[..., 1] < 0) | (k[..., 1] > out_size))
                k[..., 2] = np.where(out, 0.0, k[..., 2])
                k[..., 0] = np.clip(k[..., 0], 0, out_size)
                k[..., 1] = np.clip(k[..., 1], 0, out_size)
            all_b.append(b)
            all_k.append(k)
    bboxes = (np.concatenate(all_b) if all_b
              else np.zeros((0, 4), np.float32))
    kps = (np.concatenate(all_k) if all_k
           else np.zeros((0, 5, 3), np.float32))
    return canvas, bboxes, kps
