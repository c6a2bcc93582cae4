"""Extended aug library + TTA + XML reader + misc utils tests."""

import numpy as np

from yunet_tpu.data.aug_extra import (expand, min_iou_random_crop, mosaic4,
                                      photometric_distortion)


def _scene(h=100, w=150, n=3, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
    c = rng.uniform(20, min(h, w) - 20, (n, 2))
    wh = rng.uniform(8, 20, (n, 2))
    boxes = np.concatenate([c - wh / 2, c + wh / 2], -1).astype(np.float32)
    kps = np.zeros((n, 5, 3), np.float32)
    kps[..., :2] = c[:, None, :]
    kps[..., 2] = 1.0
    return img, boxes, kps


def test_photometric_distortion_shape_and_range():
    img, _, _ = _scene()
    out = photometric_distortion(img, np.random.RandomState(0))
    assert out.shape == img.shape
    assert out.min() >= 0 and out.max() <= 255
    # some distortion actually happened across a few seeds
    diffs = [np.abs(photometric_distortion(
        img, np.random.RandomState(s)) - img).max() for s in range(5)]
    assert max(diffs) > 1


def test_expand_preserves_content_and_shifts_targets():
    img, boxes, kps = _scene()
    boxes = np.floor(boxes)  # integer coords -> exact offset recovery
    kps[..., :2] = np.floor(kps[..., :2])
    rng = np.random.RandomState(1)
    out, nb, nk = expand(img, boxes, kps, rng, mean=(128, 128, 128))
    assert out.shape[0] >= img.shape[0] and out.shape[1] >= img.shape[1]
    # boxes shifted by the same offset everywhere, sizes preserved
    np.testing.assert_allclose(nb[:, 2] - nb[:, 0],
                               boxes[:, 2] - boxes[:, 0], atol=1e-4)
    dx = nb[0, 0] - boxes[0, 0]
    dy = nb[0, 1] - boxes[0, 1]
    np.testing.assert_allclose(nk[..., 0], kps[..., 0] + dx, atol=1e-4)
    np.testing.assert_allclose(nk[..., 1], kps[..., 1] + dy, atol=1e-4)
    # the pasted region equals the original image
    x, y = int(dx), int(dy)
    np.testing.assert_array_equal(
        out[y:y + img.shape[0], x:x + img.shape[1]], img)


def test_min_iou_random_crop_keeps_centers():
    img, boxes, kps = _scene(h=200, w=200)
    rng = np.random.RandomState(3)
    labels = np.zeros(boxes.shape[0], np.int64)
    out, nb, nk, nl = min_iou_random_crop(img, boxes, kps, labels, rng)
    assert nb.shape[0] >= 1
    assert (nb[:, :2] >= -1e-4).all()
    assert (nb[:, 2] <= out.shape[1] + 1e-4).all()
    assert nl.shape[0] == nb.shape[0] == nk.shape[0]


def test_mosaic4_combines_boxes():
    samples = []
    for s in range(4):
        img, boxes, kps = _scene(seed=s)
        samples.append((img, boxes, kps))
    rng = np.random.RandomState(0)
    canvas, nb, nk = mosaic4(samples, rng, out_size=400)
    assert canvas.shape == (400, 400, 3)
    assert nb.shape[0] > 0
    assert (nb >= 0).all() and (nb <= 400).all()
    assert nk.shape[1:] == (5, 3)


def test_detect_tta_flip_merges(yunet_n_pth):
    from yunet_tpu.apis import init_detector
    det = init_detector("yunet_n", yunet_n_pth)
    img = np.random.RandomState(0).randint(
        0, 255, (96, 128, 3)).astype(np.uint8)
    r = det.detect_tta(img, scales=((128, 96),), flip=True,
                       score_thr=0.01)
    assert set(r) == {"bboxes", "kps", "labels"}
    # flip doubles the views; merged output must be NMS-clean
    if r["bboxes"].shape[0] > 1:
        from yunet_tpu.ops.boxes import pairwise_iou
        import jax.numpy as jnp
        iou = np.asarray(pairwise_iou(jnp.asarray(r["bboxes"][:, :4]),
                                      jnp.asarray(r["bboxes"][:, :4])))
        np.fill_diagonal(iou, 0)
        assert iou.max() <= 0.45 + 1e-6


def test_widerface_xml_reader(tmp_path):
    from yunet_tpu.data.widerface_xml import parse_widerface_xml
    ann_dir = tmp_path / "Annotations"
    ann_dir.mkdir()
    (ann_dir / "img1.xml").write_text(
        "<annotation><folder>ev</folder><size><width>100</width>"
        "<height>80</height></size>"
        "<object><name>face</name><bndbox><xmin>10</xmin><ymin>10</ymin>"
        "<xmax>30</xmax><ymax>40</ymax></bndbox></object>"
        "<object><name>cat</name><bndbox><xmin>1</xmin><ymin>1</ymin>"
        "<xmax>2</xmax><ymax>2</ymax></bndbox></object>"
        "</annotation>")
    idx = tmp_path / "index.txt"
    idx.write_text("img1\n")
    recs = parse_widerface_xml(str(idx), str(tmp_path))
    assert len(recs) == 1
    assert recs[0].filename == "ev/img1.jpg"
    assert recs[0].bboxes.shape == (1, 4)  # non-face objects skipped


def test_bbox2result():
    from yunet_tpu.eval.detect import bbox2result
    bb = np.asarray([[0, 0, 1, 1, 0.9], [2, 2, 3, 3, 0.8]], np.float32)
    out = bbox2result(bb, np.asarray([0, 0]), 1)
    assert len(out) == 1 and out[0].shape == (2, 5)
    out = bbox2result(np.zeros((0, 5), np.float32), np.zeros((0,)), 1)
    assert out[0].shape == (0, 5)


def test_data_root_env_override(monkeypatch):
    from yunet_tpu.config import get_config
    monkeypatch.setenv("YUNET_DATA_ROOT", "/custom/root")
    cfg = get_config("yunet_n")
    assert cfg.data.train_ann.startswith("/custom/root/")
    assert cfg.data.val_img_prefix.startswith("/custom/root/")


def test_cutout_fills_holes():
    from yunet_tpu.data.aug_extra import cutout
    rng = np.random.RandomState(0)
    img = np.full((64, 64, 3), 200.0, np.float32)
    out = cutout(img, rng, n_holes=(2, 2), candidates=[(0.2, 0.2)],
                 with_ratio=True, fill_in=(7, 7, 7))
    assert img.min() == 200.0  # input untouched
    assert (out == 7).any() and (out == 200).any()
    # every modified pixel is exactly the fill value
    changed = out != 200
    assert np.all(out[changed.any(-1)] == 7)


def test_random_affine_identity_and_scale():
    from yunet_tpu.data.aug_extra import random_affine
    rng = np.random.RandomState(3)
    img = np.zeros((80, 80, 3), np.float32)
    img[20:40, 20:40] = 255
    boxes = np.asarray([[20, 20, 40, 40]], np.float32)
    kps = np.zeros((1, 5, 3), np.float32)
    kps[..., 0] = 30
    kps[..., 1] = 30
    kps[..., 2] = 1
    # all magnitudes zero -> exact passthrough
    out, b, k = random_affine(img, boxes, kps, rng,
                              max_rotate_degree=0, max_translate_ratio=0,
                              scaling_ratio_range=(1, 1),
                              max_shear_degree=0)
    np.testing.assert_allclose(out, img)
    np.testing.assert_allclose(b, boxes)
    np.testing.assert_allclose(k, kps)
    # pure 1.5x scale about the origin
    out, b, k = random_affine(img, boxes, kps, rng,
                              max_rotate_degree=0, max_translate_ratio=0,
                              scaling_ratio_range=(1.5, 1.5),
                              max_shear_degree=0)
    np.testing.assert_allclose(b, boxes * 1.5)
    np.testing.assert_allclose(k[..., :2], 45.0)
    assert k[..., 2].all()


def test_random_affine_kp_visibility_zeroed_outside():
    from yunet_tpu.data.aug_extra import random_affine
    rng = np.random.RandomState(0)
    img = np.zeros((40, 40, 3), np.float32)
    boxes = np.asarray([[2, 2, 20, 20]], np.float32)
    kps = np.zeros((1, 5, 3), np.float32)
    kps[..., 0] = 3
    kps[..., 1] = 3
    kps[..., 2] = 1
    # 0.2x scale pushes nothing out; translation is 0 — shrink keeps all in
    out, b, k = random_affine(img, boxes, kps, rng,
                              max_rotate_degree=0, max_translate_ratio=0,
                              scaling_ratio_range=(3.0, 3.0),
                              max_shear_degree=0)
    # 3x scale pushes the box partly out; kps at 9,9 stay visible
    assert k.shape[0] == b.shape[0]
    if k.size:
        assert k[..., 2].all()


def test_mixup_blends_and_appends_annotations():
    from yunet_tpu.data.aug_extra import mixup
    rng = np.random.RandomState(1)
    img = np.zeros((100, 100, 3), np.float32)
    boxes = np.asarray([[5, 5, 15, 15]], np.float32)
    kps = np.zeros((1, 5, 3), np.float32)
    kps[..., 2] = 1
    mix_img = np.full((100, 100, 3), 200.0, np.float32)
    mix_boxes = np.asarray([[10, 10, 50, 50]], np.float32)
    mix_kps = np.zeros((1, 5, 3), np.float32)
    mix_kps[..., 0] = 30
    mix_kps[..., 1] = 30
    mix_kps[..., 2] = 1
    out, b, k = mixup(img, boxes, kps, mix_img, mix_boxes, mix_kps, rng,
                      img_scale=(100, 100), ratio_range=(1.0, 1.0),
                      flip_ratio=1.0)  # uniform > 1.0 never true: no flip
    # 0.5 * 0 + 0.5 * 200 = 100 everywhere (canvas exactly covered)
    np.testing.assert_allclose(out, 100.0)
    assert b.shape[0] == 2
    np.testing.assert_allclose(b[1], mix_boxes[0])
    np.testing.assert_allclose(k[1, :, :2], 30.0)
    assert k[1, :, 2].all()


def test_mixup_empty_mix_boxes_is_identity():
    from yunet_tpu.data.aug_extra import mixup
    rng = np.random.RandomState(0)
    img = np.zeros((50, 50, 3), np.float32)
    boxes = np.asarray([[1, 1, 9, 9]], np.float32)
    kps = np.zeros((1, 5, 3), np.float32)
    out, b, k = mixup(img, boxes, kps, np.full((50, 50, 3), 99.0),
                      np.zeros((0, 4), np.float32),
                      np.zeros((0, 5, 3), np.float32), rng)
    np.testing.assert_allclose(out, img)
    assert b.shape[0] == 1


class _Always(np.random.RandomState):
    """rng whose rand() always passes prob gates and never negates."""
    def rand(self, *a):
        return 0.0 if not a else super().rand(*a)


def test_autoaug_equalize_matches_pil():
    from PIL import Image, ImageOps
    from yunet_tpu.data.auto_augment import equalize
    rng = _Always(0)
    img = np.random.RandomState(1).randint(0, 200, (40, 60, 3)) \
        .astype(np.float32)
    got = equalize(img, rng, prob=1.0)
    want = np.asarray(ImageOps.equalize(
        Image.fromarray(img.astype(np.uint8))))
    np.testing.assert_array_equal(got.astype(np.uint8), want)


def test_autoaug_photometric_endpoints():
    from yunet_tpu.data.auto_augment import (adjust_brightness,
                                             adjust_color, adjust_contrast)
    rng = _Always(0)
    img = np.random.RandomState(2).randint(0, 256, (16, 16, 3)) \
        .astype(np.float32)
    # enhance_level_to_value(5) = 1.0 -> identity blend
    np.testing.assert_allclose(adjust_brightness(img, rng, level=5), img)
    np.testing.assert_allclose(adjust_color(img, rng, level=5), img)
    np.testing.assert_allclose(adjust_contrast(img, rng, level=5), img)
    # level 0 -> factor 0.1: brightness scales pixels by 0.1
    np.testing.assert_allclose(
        adjust_brightness(img, rng, level=0), np.clip(img * 0.1, 0, 255),
        atol=1e-4)


def test_autoaug_translate_moves_annotations():
    from yunet_tpu.data.auto_augment import translate
    rng = _Always(3)
    img = np.zeros((100, 100, 3), np.float32)
    img[10:20, 10:20] = 255
    boxes = np.asarray([[10, 10, 20, 20]], np.float32)
    kps = np.zeros((1, 5, 3), np.float32)
    kps[..., :2] = 15
    kps[..., 2] = 1
    # level 10 * max_offset 250 = 250 is clipped out; use max_offset 30
    out, b, k = translate(img, boxes, kps, rng, level=10, prob=1.0,
                          max_translate_offset=30,
                          random_negative_prob=0.0)
    np.testing.assert_allclose(b, [[40, 10, 50, 20]])
    np.testing.assert_allclose(k[0, :, 0], 45)
    np.testing.assert_allclose(k[0, :, 1], 15)
    assert out[15, 45, 0] == 255 and out[15, 15, 0] != 255


def test_autoaug_rotate_and_shear_identity_at_level0():
    from yunet_tpu.data.auto_augment import rotate, shear
    rng = _Always(4)
    img = np.random.RandomState(5).randint(0, 256, (32, 32, 3)) \
        .astype(np.float32)
    boxes = np.asarray([[4, 4, 20, 20]], np.float32)
    kps = np.ones((1, 5, 3), np.float32) * 10
    kps[..., 2] = 1
    for fn in (rotate, shear):
        out, b, k = fn(img, boxes, kps, rng, level=0, prob=1.0)
        np.testing.assert_allclose(out, img, atol=1e-3)
        np.testing.assert_allclose(b, boxes, atol=1e-4)
        np.testing.assert_allclose(k, kps, atol=1e-4)


def test_autoaug_policy_driver():
    from yunet_tpu.data.auto_augment import auto_augment, default_policies
    rng = np.random.RandomState(6)
    img = np.random.RandomState(7).randint(0, 256, (64, 64, 3)) \
        .astype(np.float32)
    boxes = np.asarray([[8, 8, 40, 40], [20, 20, 50, 50]], np.float32)
    kps = np.zeros((2, 5, 3), np.float32)
    kps[..., :2] = 25
    kps[..., 2] = 1
    for _ in range(8):
        out, b, k = auto_augment(img, boxes, kps, rng, default_policies())
        assert out.shape == img.shape
        assert b.shape[0] == k.shape[0]
        if b.size:
            assert (b[:, :2] >= 0).all() and (b[:, 2:] <= 64).all()
