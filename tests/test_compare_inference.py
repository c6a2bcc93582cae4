"""tools/compare_inference.py decoders + harness pieces.

Each competitor decoder (SCRFD, RetinaFace, YOLO5Face — reference
tools/compare_inference.py:334-700) is unit-tested against synthetic
contract tensors built by inverting the decode math for known target
boxes/landmarks."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import compare_inference as ci  # noqa: E402


def test_scrfd_decoder_roundtrip():
    """Known boxes encoded as ltrb distances at their anchor centers must
    decode back exactly (2 anchors/cell, strides 8/16/32)."""
    h = w = 64
    strides = (8, 16, 32)
    na = 2
    targets = {  # stride -> (cell_flat_idx, anchor, box, kps_center)
        8: (9, 0, (4.0, 6.0, 20.0, 30.0)),
        16: (5, 1, (10.0, 12.0, 50.0, 44.0)),
    }
    outs = []
    for s in strides:   # scores
        n = (h // s) * (w // s) * na
        sc = np.zeros((n, 1), np.float32)
        if s in targets:
            cell, a, _ = targets[s]
            sc[cell * na + a] = 0.9
        outs.append(sc)
    for s in strides:   # bboxes (ltrb / stride)
        fh, fw = h // s, w // s
        n = fh * fw * na
        bb = np.zeros((n, 4), np.float32)
        if s in targets:
            cell, a, (x1, y1, x2, y2) = targets[s]
            cx = (cell % fw) * s
            cy = (cell // fw) * s
            bb[cell * na + a] = [(cx - x1) / s, (cy - y1) / s,
                                 (x2 - cx) / s, (y2 - cy) / s]
        outs.append(bb)
    for s in strides:   # kps offsets
        n = (h // s) * (w // s) * na
        kp = np.zeros((n, 10), np.float32)
        if s in targets:
            cell, a, _ = targets[s]
            kp[cell * na + a] = 0.5   # all landmarks at center + 0.5*s
        outs.append(kp)

    dets, kps = ci.numpy_decode_scrfd(outs, (h, w), score_thr=0.5)
    assert dets.shape == (2, 5)
    got = {tuple(np.round(d[:4], 3)) for d in dets}
    assert got == {t[2] for t in targets.values()}
    # landmarks: center + 0.5*stride offsets
    for d, k in zip(dets, kps):
        assert np.all(k[0::2] >= d[0] - 64) and np.isfinite(k).all()


def test_retinaface_decoder_roundtrip():
    h = w = 32
    priors = ci.retinaface_priors((h, w))
    var = (0.1, 0.2)
    n = len(priors)
    tgt_idx = 7
    box = np.asarray([6.0, 8.0, 22.0, 28.0], np.float32)  # pixels
    cxy = (box[:2] + box[2:]) / 2 / (w, h)
    wh = (box[2:] - box[:2]) / (w, h)
    p = priors[tgt_idx]
    loc = np.zeros((1, n, 4), np.float32)
    loc[0, tgt_idx, :2] = (cxy - p[:2]) / (var[0] * p[2:])
    loc[0, tgt_idx, 2:] = np.log(wh / p[2:]) / var[1]
    conf = np.zeros((1, n, 2), np.float32)
    conf[0, tgt_idx, 1] = 0.8
    landms = np.zeros((1, n, 10), np.float32)
    kp_px = np.asarray([10.0, 12.0], np.float32)
    for i in range(5):
        landms[0, tgt_idx, 2 * i:2 * i + 2] = (
            (kp_px / (w, h)) - p[:2]) / (var[0] * p[2:])

    dets, kps = ci.numpy_decode_retinaface([loc, conf, landms], (h, w),
                                           score_thr=0.5)
    assert dets.shape == (1, 5)
    np.testing.assert_allclose(dets[0, :4], box, atol=1e-4)
    np.testing.assert_allclose(dets[0, 4], 0.8, atol=1e-6)
    np.testing.assert_allclose(kps[0].reshape(5, 2),
                               np.tile(kp_px, (5, 1)), atol=1e-4)


def test_yolo5face_decoder():
    rows = np.zeros((1, 4, 16), np.float32)
    rows[0, 1] = [50, 60, 20, 30, 0.9,            # cx cy w h obj
                  45, 55, 55, 55, 50, 60, 47, 66, 53, 66,   # 5 kps
                  0.8]                            # cls
    rows[0, 3] = [200, 200, 10, 10, 0.4] + [0] * 10 + [0.9]  # obj too low
    dets, kps = ci.numpy_decode_yolo5face(rows, score_thr=0.5)
    assert dets.shape == (1, 5)
    np.testing.assert_allclose(dets[0, :4], [40, 45, 60, 75], atol=1e-5)
    np.testing.assert_allclose(dets[0, 4], 0.72, atol=1e-5)
    np.testing.assert_allclose(kps[0][:2], [45, 55], atol=1e-5)


def test_yolo5face_nms_suppresses_duplicates():
    rows = np.zeros((1, 2, 16), np.float32)
    rows[0, 0] = [50, 50, 20, 20, 0.9] + [0] * 10 + [1.0]
    rows[0, 1] = [51, 51, 20, 20, 0.8] + [0] * 10 + [1.0]
    dets, _ = ci.numpy_decode_yolo5face(rows, score_thr=0.5, nms_thr=0.45)
    assert dets.shape == (1, 5)
    np.testing.assert_allclose(dets[0, 4], 0.9, atol=1e-6)


def test_resize_img_modes():
    img = np.zeros((100, 150, 3), np.uint8)
    out, s = ci.resize_img(img, "AUTO")
    assert out.shape == (128, 160, 3) and s == 1.0
    out, s = ci.resize_img(img, "ORIGIN")
    assert out.shape == (100, 150, 3) and s == 1.0
    out, s = ci.resize_img(img, "320,320")
    assert out.shape == (320, 320, 3)
    # landscape 150x100 -> width to 320, height int-truncated (reference
    # resize_img convention), letterboxed below
    np.testing.assert_allclose(s, int(320 * 100 / 150) / 100, rtol=1e-6)


def test_time_engine_report():
    te = ci.TimeEngine()
    with te("preprocess"):
        pass
    with te("forward_run"):
        pass
    rep = te.report(1)
    assert "preprocess" in rep and "total" in rep and "FPS" in rep


def test_tflite_engine_matches_onnx_engine(yunet_n_pth, tmp_path):
    """tflite:<path> engine == onnx:<path> engine on the same weights and
    input size. Both route through the identical independent numpy decode
    (numpy_decode_yunet), so any detection gap is forward drift in one of
    the two exporters — the engine-level version of the tensor parity
    gates in tests/test_export.py."""
    import pytest
    pytest.importorskip("tensorflow")
    from yunet_tpu.config import yunet_n
    from yunet_tpu.export.onnx_export import export_onnx
    from yunet_tpu.export.tflite_export import export_tflite
    from yunet_tpu.utils import load_pth_params

    cfg = yunet_n()
    params, state = load_pth_params(yunet_n_pth)
    onnx_p = tmp_path / "m.onnx"
    tfl_p = tmp_path / "m.tflite"
    onnx_p.write_bytes(
        export_onnx(params, state, cfg.model, input_shape=(96, 128)))
    tfl_p.write_bytes(
        export_tflite(params, state, cfg.model, input_shape=(96, 128)))

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (120, 160, 3)).astype(np.uint8)
    # tiny score_thr so noise input still yields a populated keep set
    e_on = ci.build_engine(f"onnx:{onnx_p}", score_thr=1e-4)
    e_tf = ci.build_engine(f"tflite:{tfl_p}", score_thr=1e-4)
    d0, k0 = e_on.detect(img)
    d1, k1 = e_tf.detect(img)
    assert len(d0) > 0 and d0.shape == d1.shape
    np.testing.assert_allclose(d1, d0, rtol=1e-3, atol=5e-2)
    np.testing.assert_allclose(k1, k0, rtol=1e-3, atol=5e-2)
    assert e_tf.hw == (96, 128)
    assert "forward_run" in e_tf.times.report(1)
