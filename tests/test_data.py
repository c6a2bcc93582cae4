"""Data layer tests: labelv2 parsing on the real val annotations, crop/flip
semantics, fixed-shape packing."""

import os

import numpy as np
import pytest

from yunet_tpu.data import (parse_labelv2, random_square_crop,
                            horizontal_flip, pack_batch)
from yunet_tpu.data.dataset import pack_sample
from yunet_tpu.data.transforms import resize_with_targets, KPS_FLIP_ORDER

VAL_ANN = "/root/reference/data/widerface/labelv2/val/labelv2.txt"


@pytest.mark.skipif(not os.path.exists(VAL_ANN),
                    reason="reference val labels unavailable")
def test_parse_real_val_labels():
    recs = parse_labelv2(VAL_ANN, test_mode=True)
    assert len(recs) == 3226  # WIDER val images
    r0 = recs[0]
    assert r0.filename.endswith(".jpg")
    assert r0.bboxes.shape[1] == 4
    assert r0.kps.shape[1:] == (5, 3)
    # val labels have no landmark annotations -> all kp weights 0
    assert float(r0.kps[:, :, 2].sum()) == 0.0
    total_faces = sum(r.bboxes.shape[0] + r.bboxes_ignore.shape[0]
                      for r in recs)
    assert total_faces > 39000  # ~39.7k val faces


def test_parse_semantics(tmp_path):
    p = tmp_path / "l.txt"
    p.write_text(
        "# a/x.jpg 100 80\n"
        "10 10 30 30 11 11 1.0 12 11 1.0 13 13 1.0 11 14 1.0 13 14 1.0\n"
        "40 40 50 50 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1 -1\n"
        "5 5 8 8 1\n"
        "# b/y.jpg 50 50\n"
        "1 1 4 4 0\n")
    recs = parse_labelv2(str(p))
    assert len(recs) == 2
    a = recs[0]
    assert a.bboxes.shape == (2, 4)        # third face is ignored
    assert a.bboxes_ignore.shape == (1, 4)
    assert a.kps[0, :, 2].sum() == 5.0     # visible landmarks
    assert a.kps[1, :, 2].sum() == 0.0     # all -1 -> weight 0
    b = recs[1]
    assert b.bboxes.shape == (1, 4)        # flag 0 -> kept
    # min_size moves small faces to ignore; empty images dropped
    recs2 = parse_labelv2(str(p), min_size=15)
    assert len(recs2) == 1
    assert recs2[0].bboxes.shape == (1, 4)
    assert recs2[0].bboxes_ignore.shape == (2, 4)


def _toy_scene(h=200, w=300):
    img = np.arange(h * w * 3, dtype=np.float32).reshape(h, w, 3) % 255
    boxes = np.asarray([[50, 50, 90, 100], [200, 120, 260, 180]], np.float32)
    kps = np.zeros((2, 5, 3), np.float32)
    kps[:, :, 0] = np.linspace(55, 85, 5)
    kps[:, :, 1] = 60.0
    kps[:, :, 2] = 1.0
    return img, boxes, kps, np.zeros((0, 4), np.float32)


def test_random_square_crop_within_image():
    img, boxes, kps, ign = _toy_scene()
    rng = np.random.RandomState(0)
    cimg, cboxes, ckps, _ = random_square_crop(
        img, boxes, kps, ign, [0.5], rng)
    side = int(0.5 * 200)
    assert cimg.shape == (side, side, 3)
    assert cboxes.shape[0] >= 1
    assert (cboxes[:, :2] >= 0).all() and (cboxes[:, 2:] <= side).all()
    assert (ckps[:, :, 0] >= 0).all() and (ckps[:, :, 0] <= side).all()


def test_random_square_crop_oversized_pads_128():
    img, boxes, kps, ign = _toy_scene()
    rng = np.random.RandomState(1)
    cimg, cboxes, _, _ = random_square_crop(img, boxes, kps, ign, [1.5], rng)
    side = int(1.5 * 200)
    assert cimg.shape == (side, side, 3)
    assert (cimg == 128).any()  # out-of-image area is gray-128
    assert cboxes.shape[0] >= 1


def test_hflip_reorders_landmarks():
    img, boxes, kps, ign = _toy_scene()
    fimg, fboxes, fkps, _ = horizontal_flip(img, boxes, kps, ign)
    w = img.shape[1]
    np.testing.assert_allclose(fboxes[0, 0], w - boxes[0, 2])
    np.testing.assert_allclose(fboxes[0, 2], w - boxes[0, 0])
    # landmark k comes from KPS_FLIP_ORDER[k], x mirrored
    for k, src in enumerate(KPS_FLIP_ORDER):
        np.testing.assert_allclose(fkps[0, k, 0], w - kps[0, src, 0])
        np.testing.assert_allclose(fkps[0, k, 1], kps[0, src, 1])
    np.testing.assert_array_equal(np.asarray(fimg)[:, 0], img[:, -1])


def test_resize_scales_targets():
    img, boxes, kps, ign = _toy_scene()
    rimg, rboxes, rkps, _ = resize_with_targets(img, boxes, kps, ign,
                                                (640, 640))
    assert rimg.shape == (640, 640, 3)
    np.testing.assert_allclose(rboxes[0, 0], boxes[0, 0] * 640 / 300)
    np.testing.assert_allclose(rboxes[0, 1], boxes[0, 1] * 640 / 200)
    np.testing.assert_allclose(rkps[0, 0, 0], kps[0, 0, 0] * 640 / 300)


def test_pack_sample_overflow_keeps_largest():
    img = np.zeros((64, 64, 3), np.float32)
    n = 10
    sizes = np.arange(1, n + 1, dtype=np.float32)
    boxes = np.stack([np.zeros(n), np.zeros(n), sizes, sizes],
                     axis=1).astype(np.float32)
    kps = np.zeros((n, 5, 3), np.float32)
    s = pack_sample(img, boxes, kps, max_gts=4)
    assert int(s["num_overflow"]) == 6
    assert s["gt_valid"].sum() == 4
    kept = s["gt_bboxes"][s["gt_valid"]]
    assert set(kept[:, 2]) == {10.0, 9.0, 8.0, 7.0}
    batch = pack_batch([s, s])
    assert batch["image"].shape == (2, 64, 64, 3)
    assert batch["gt_bboxes"].shape == (2, 4, 4)


def _mini_jpeg_dataset(tmp_path, n=3, hw=(800, 1100)):
    import cv2
    img_dir = tmp_path / "images" / "0--Ev"
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    lines = []
    for j in range(n):
        h, w = hw
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"img{j}.jpg"), img)
        faces = []
        for _ in range(3):
            x, y = rng.randint(0, w - 150), rng.randint(0, h - 150)
            bw = rng.randint(30, 120)
            kp = " ".join(f"{x + bw / 2:.1f} {y + bw / 2:.1f} 1.0"
                          for _ in range(5))
            faces.append(f"{x} {y} {x + bw} {y + bw} {kp}")  # xyxy
        lines.append(f"# 0--Ev/img{j}.jpg {w} {h}\n" + "\n".join(faces))
    ann = tmp_path / "labelv2.txt"
    ann.write_text("\n".join(lines) + "\n")
    return str(ann), str(tmp_path / "images")


def test_decoded_cache_samples_identical(tmp_path):
    """The mmap cache path must be bit-identical to direct JPEG decode:
    it stores exactly the cv2-decoded array."""
    from yunet_tpu.data.cache import build_decoded_cache
    from yunet_tpu.data.dataset import SampleSpec, WiderFaceDataset

    ann, img_prefix = _mini_jpeg_dataset(tmp_path)
    cache_dir = str(tmp_path / "decoded")
    n = build_decoded_cache(ann, img_prefix, cache_dir, verbose=False)
    assert n == 3
    assert build_decoded_cache(ann, img_prefix, cache_dir,
                               verbose=False) == 0  # idempotent
    spec = SampleSpec(img_size=320, max_gts=16)
    ds_a = WiderFaceDataset(ann, img_prefix, spec)
    ds_b = WiderFaceDataset(ann, img_prefix, spec, decoded_cache=cache_dir)
    for i in range(3):
        a = ds_a.get_train_sample(i, np.random.RandomState(100 + i))
        b = ds_b.get_train_sample(i, np.random.RandomState(100 + i))
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_reduced_decode_valid_and_triggered(tmp_path):
    """With a large image and a big crop scale the reduced path must pick
    a >1 libjpeg reduction and still produce a valid in-bounds sample."""
    from yunet_tpu.data.cache import pick_reduction
    from yunet_tpu.data.dataset import SampleSpec, WiderFaceDataset

    # crop = 1.5 * 1400 = 2100 px onto 640 -> reduction 2 applies
    assert pick_reduction(1400, 1.5, 640) == 2
    assert pick_reduction(640, 0.5, 640) == 1
    assert pick_reduction(20000, 1.5, 640) == 8

    ann, img_prefix = _mini_jpeg_dataset(tmp_path, n=2, hw=(1400, 1600))
    spec = SampleSpec(img_size=640, max_gts=16, crop_choice=(1.5,))
    ds = WiderFaceDataset(ann, img_prefix, spec, reduced_decode=True)
    for i in range(2):
        s = ds.get_train_sample(i, np.random.RandomState(7 + i))
        assert s["image"].shape == (640, 640, 3)
        v = s["gt_valid"]
        assert v.any()
        b = s["gt_bboxes"][v]
        assert (b[:, :2] >= 0).all() and (b[:, 2:] <= 640).all()
        assert (b[:, 2:] >= b[:, :2]).all()
        k = s["gt_kps"][v]
        assert (k[..., :2] >= 0).all() and (k[..., :2] <= 640).all()
