#!/usr/bin/env python
"""Generate a synthetic WIDER-Face-shaped dataset on disk.

WIDER images are not distributable in this environment, so the training
dress-rehearsal, convergence A/Bs, and eval-hook integration runs use a
generated stand-in with the same on-disk shape as the real thing
(reference data layout: data/widerface/labelv2/{train,val}/labelv2.txt +
images + val GT .mat files, mmdet/datasets/retinaface.py:29-100):

  <out>/train/images/<event>/<stem>.jpg       mixed resolutions
  <out>/train/labelv2.txt                     # path W H + face rows
  <out>/val/images/... , <out>/val/labelv2.txt
  <out>/val/gt/wider_{face,easy,medium,hard}_val.mat

Faces are structured renders (skin-tone ellipse, dark eyes, nose, mouth)
with the canonical 5-landmark layout, so a detector can genuinely learn
localization + keypoint regression from this data — the convergence A/B
runs (recipe-vs-throughput batch, bf16-vs-f32) need a learnable signal,
not noise. Difficulty subsets mirror WIDER semantics: easy ⊆ medium ⊆
hard by face size.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _skin(rng):
    # BGR skin-ish tones with variation
    b = rng.randint(90, 160)
    g = rng.randint(120, 190)
    r = rng.randint(170, 240)
    return int(b), int(g), int(r)


def draw_face(img, cx, cy, s, rng):
    """Render one face of nominal size s centered at (cx, cy).

    Returns (bbox_xyxy, kps (5,3)) in image coordinates.
    """
    import cv2

    angle = float(rng.uniform(-12, 12))
    axes = (max(int(0.40 * s), 2), max(int(0.50 * s), 2))
    cv2.ellipse(img, ((cx, cy), (2 * axes[0], 2 * axes[1]), angle),
                _skin(rng), -1, lineType=cv2.LINE_AA)
    # canonical landmark layout with jitter
    j = 0.02 * s
    pts = np.asarray([
        [cx - 0.18 * s, cy - 0.13 * s],   # left eye
        [cx + 0.18 * s, cy - 0.13 * s],   # right eye
        [cx, cy + 0.06 * s],              # nose tip
        [cx - 0.14 * s, cy + 0.27 * s],   # left mouth corner
        [cx + 0.14 * s, cy + 0.27 * s],   # right mouth corner
    ], np.float32) + rng.uniform(-j, j, (5, 2)).astype(np.float32)
    dark = (int(rng.randint(10, 60)),) * 3
    er = max(int(0.07 * s), 1)
    for p in pts[:2]:
        cv2.circle(img, (int(p[0]), int(p[1])), er, dark, -1,
                   lineType=cv2.LINE_AA)
    cv2.circle(img, (int(pts[2][0]), int(pts[2][1])), max(er // 2, 1),
               (60, 80, 120), -1, lineType=cv2.LINE_AA)
    cv2.line(img, (int(pts[3][0]), int(pts[3][1])),
             (int(pts[4][0]), int(pts[4][1])),
             (40, 40, 120), max(er // 2, 1), lineType=cv2.LINE_AA)
    bbox = np.asarray([cx - 0.42 * s, cy - 0.52 * s,
                       cx + 0.42 * s, cy + 0.52 * s], np.float32)
    kps = np.concatenate([pts, np.ones((5, 1), np.float32)], 1)
    return bbox, kps


def make_background(rng, h, w):
    """Smooth gradient + noise + box/circle distractors (non-face clutter)."""
    import cv2

    yy = np.linspace(0, 1, h, dtype=np.float32)[:, None, None]
    xx = np.linspace(0, 1, w, dtype=np.float32)[None, :, None]
    base = rng.uniform(30, 160, (1, 1, 3)).astype(np.float32)
    grad = rng.uniform(-60, 60, (1, 1, 3)).astype(np.float32)
    img = base + yy * grad + xx * rng.uniform(-60, 60, (1, 1, 3))
    img = img + rng.normal(0, 12, (h, w, 3))
    img = np.clip(img, 0, 255).astype(np.uint8)
    for _ in range(rng.randint(2, 8)):
        color = tuple(int(c) for c in rng.randint(0, 255, 3))
        if rng.uniform() < 0.5:
            x0, y0 = rng.randint(0, w), rng.randint(0, h)
            cv2.rectangle(img, (x0, y0),
                          (x0 + rng.randint(8, w // 3),
                           y0 + rng.randint(8, h // 3)), color, -1)
        else:
            cv2.circle(img, (rng.randint(0, w), rng.randint(0, h)),
                       rng.randint(4, min(h, w) // 5), color, -1)
    return img


def make_image(rng, w, h, max_faces=14, min_face=12):
    """One synthetic image + its face annotations."""
    img = make_background(rng, h, w)
    n = int(rng.randint(1, max_faces + 1))
    boxes, kpss = [], []
    smax = 0.5 * min(w, h)
    for _ in range(n):
        # log-uniform sizes: plenty of small ("hard") faces like WIDER
        s = float(np.exp(rng.uniform(np.log(min_face), np.log(smax))))
        placed = False
        for _try in range(25):
            cx = rng.uniform(0.55 * s, w - 0.55 * s)
            cy = rng.uniform(0.6 * s, h - 0.6 * s)
            cand = np.asarray([cx - 0.5 * s, cy - 0.6 * s,
                               cx + 0.5 * s, cy + 0.6 * s], np.float32)
            ok = True
            for b in boxes:
                ix = max(0.0, min(cand[2], b[2]) - max(cand[0], b[0]))
                iy = max(0.0, min(cand[3], b[3]) - max(cand[1], b[1]))
                if ix * iy > 0.15 * min((cand[2] - cand[0]) * (cand[3] - cand[1]),
                                        (b[2] - b[0]) * (b[3] - b[1])):
                    ok = False
                    break
            if ok:
                placed = True
                break
        if not placed:
            continue
        bbox, kps = draw_face(img, cx, cy, s, rng)
        boxes.append(bbox)
        kpss.append(kps)
    if not boxes:   # guarantee at least one face
        s = 0.25 * min(w, h)
        bbox, kps = draw_face(img, w / 2, h / 2, s, rng)
        boxes.append(bbox)
        kpss.append(kps)
    return img, np.stack(boxes), np.stack(kpss)


_RESOLUTIONS = [(1024, 768), (1024, 680), (900, 600), (800, 600),
                (768, 1024), (640, 480), (512, 384), (1000, 562),
                (600, 800), (512, 768)]


def _face_lines(boxes, kpss):
    lines = []
    for b, k in zip(boxes, kpss):
        vals = [f"{v:.1f}" for v in b]
        for p in k:
            vals += [f"{p[0]:.1f}", f"{p[1]:.1f}", f"{p[2]:.0f}"]
        lines.append(" ".join(vals))
    return lines


def generate_split(out_dir, n_images, seed, events=4, jpeg_quality=90):
    """Write images + labelv2.txt; return per-event annotation lists."""
    import cv2

    rng = np.random.RandomState(seed)
    img_root = os.path.join(out_dir, "images")
    lines = []
    per_event = {}
    for i in range(n_images):
        ev = f"{i % events}--Synth"
        ev_dir = os.path.join(img_root, ev)
        os.makedirs(ev_dir, exist_ok=True)
        w, h = _RESOLUTIONS[rng.randint(len(_RESOLUTIONS))]
        img, boxes, kpss = make_image(rng, w, h)
        stem = f"synth_{i:04d}"
        path = os.path.join(ev_dir, stem + ".jpg")
        assert cv2.imwrite(path, img,
                           [cv2.IMWRITE_JPEG_QUALITY, jpeg_quality])
        lines.append(f"# {ev}/{stem}.jpg {w} {h}")
        lines.extend(_face_lines(boxes, kpss))
        per_event.setdefault(ev, []).append((stem, boxes, kpss))
    with open(os.path.join(out_dir, "labelv2.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return per_event


def write_gt_mats(gt_dir, per_event):
    """Official-format GT .mat files (reference widerface.py:63-81 reader).

    Difficulty subsets mirror WIDER: hard = all faces, medium = faces with
    height >= 30px, easy = height >= 60px (1-based keep indices).
    """
    from scipy.io import savemat

    os.makedirs(gt_dir, exist_ok=True)
    names = sorted(per_event)
    e = len(names)
    event_list = np.empty((e, 1), object)
    file_list = np.empty((e, 1), object)
    facebox_list = np.empty((e, 1), object)
    subsets = {"easy": 60.0, "medium": 30.0, "hard": 0.0}
    gt_lists = {s: np.empty((e, 1), object) for s in subsets}
    for i, name in enumerate(names):
        imgs = per_event[name]
        m = len(imgs)
        event_list[i, 0] = np.asarray([name])
        fl = np.empty((m, 1), object)
        fb = np.empty((m, 1), object)
        gls = {s: np.empty((m, 1), object) for s in subsets}
        for j, (stem, boxes, _kps) in enumerate(imgs):
            fl[j, 0] = np.asarray([stem])
            xywh = np.concatenate(
                [boxes[:, :2], boxes[:, 2:4] - boxes[:, :2]], 1)
            fb[j, 0] = xywh.astype(np.float64)
            heights = xywh[:, 3]
            for s, thr in subsets.items():
                keep = np.flatnonzero(heights >= thr) + 1   # 1-based
                gls[s][j, 0] = keep.astype(np.float64).reshape(-1, 1)
        file_list[i, 0] = fl
        facebox_list[i, 0] = fb
        for s in subsets:
            gt_lists[s][i, 0] = gls[s]
    savemat(os.path.join(gt_dir, "wider_face_val.mat"), {
        "face_bbx_list": facebox_list, "event_list": event_list,
        "file_list": file_list})
    for s in subsets:
        savemat(os.path.join(gt_dir, f"wider_{s}_val.mat"),
                {"gt_list": gt_lists[s]})


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="data/synth_wider")
    p.add_argument("--train-n", type=int, default=600)
    p.add_argument("--val-n", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--jpeg-quality", type=int, default=90)
    args = p.parse_args(argv)

    train_dir = os.path.join(args.out, "train")
    val_dir = os.path.join(args.out, "val")
    os.makedirs(train_dir, exist_ok=True)
    os.makedirs(val_dir, exist_ok=True)
    generate_split(train_dir, args.train_n, args.seed,
                   jpeg_quality=args.jpeg_quality)
    per_event = generate_split(val_dir, args.val_n, args.seed + 7919,
                               jpeg_quality=args.jpeg_quality)
    write_gt_mats(os.path.join(val_dir, "gt"), per_event)
    print(f"wrote {args.train_n} train + {args.val_n} val images "
          f"under {args.out}")
    return args.out


if __name__ == "__main__":
    main()
