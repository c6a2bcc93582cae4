"""tools/make_synth_wider.py: the synthetic WIDER-shaped dataset used by
the dress-rehearsal and convergence-A/B runs must round-trip through the
real data layer (labelv2 parser, WiderFaceDataset aug path) and the real
WIDER evaluation protocol."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    import make_synth_wider as gen
    out = tmp_path_factory.mktemp("synth")
    gen.main(["--out", str(out), "--train-n", "6", "--val-n", "3"])
    return out


def test_labelv2_roundtrip_and_sample(synth_root):
    from yunet_tpu.data.dataset import SampleSpec, WiderFaceDataset
    from yunet_tpu.data.labelv2 import parse_labelv2

    recs = parse_labelv2(str(synth_root / "train" / "labelv2.txt"))
    assert len(recs) == 6
    assert all(r.bboxes.shape[0] >= 1 for r in recs)
    # keypoints visible and inside their box (face render contract)
    r = recs[0]
    assert np.all(r.kps[:, :, 2] == 1.0)
    assert np.all(r.kps[:, :, 0] >= r.bboxes[:, None, 0] - 1)
    assert np.all(r.kps[:, :, 0] <= r.bboxes[:, None, 2] + 1)

    ds = WiderFaceDataset(str(synth_root / "train" / "labelv2.txt"),
                          str(synth_root / "train" / "images"), SampleSpec())
    s = ds.get_train_sample(0, np.random.RandomState(0))
    assert s["image"].shape == (640, 640, 3)
    assert s["image"].dtype == np.uint8
    assert s["gt_valid"].sum() >= 1


def test_mixed_resolutions(synth_root):
    from yunet_tpu.data.labelv2 import parse_labelv2
    recs = parse_labelv2(str(synth_root / "train" / "labelv2.txt"))
    assert len({(r.width, r.height) for r in recs}) >= 2


def test_gt_mats_score_perfect_predictions(synth_root):
    """Predictions == annotations must give AP ~1.0 on every subset —
    proves the generated GT .mat files follow the official protocol
    (reference widerface.py:63-81,274-346)."""
    from yunet_tpu.data.labelv2 import parse_labelv2
    from yunet_tpu.eval.widerface import wider_evaluation

    recs = parse_labelv2(str(synth_root / "val" / "labelv2.txt"),
                         test_mode=True)
    pred = {}
    for r in recs:
        ev, fname = r.filename.split("/")
        stem = os.path.splitext(fname)[0]
        xywh = np.concatenate(
            [r.bboxes[:, :2], r.bboxes[:, 2:4] - r.bboxes[:, :2]], 1)
        scores = np.linspace(0.95, 0.5, len(xywh))[:, None]
        pred.setdefault(ev, {})[stem] = np.concatenate(
            [xywh, scores], 1).astype(np.float64)
    aps = wider_evaluation(pred, str(synth_root / "val" / "gt"))
    assert len(aps) == 3
    for ap in aps:
        assert ap > 0.99, aps


@pytest.fixture(scope="module")
def hard_root(tmp_path_factory):
    import make_synth_wider as gen
    out = tmp_path_factory.mktemp("synth_hard")
    gen.main(["--out", str(out), "--train-n", "16", "--val-n", "8",
              "--tier", "hard"])
    return out


def test_hard_tier_difficulty_distribution(hard_root):
    """The hard tier must actually BE hard: tiny faces, crowds, ignore
    regions, invisible (occluded) landmarks — the WIDER-hard-like
    properties the round-3 VERDICT asked for (reference
    widerface.py:63-81 difficulty subsets)."""
    from yunet_tpu.data.labelv2 import parse_labelv2

    recs = parse_labelv2(str(hard_root / "train" / "labelv2.txt"))
    heights = np.concatenate(
        [r.bboxes[:, 3] - r.bboxes[:, 1] for r in recs])
    assert (heights < 16).mean() > 0.2, "tiny faces missing"
    assert heights.min() < 8
    assert max(len(r.bboxes) for r in recs) >= 20, "no crowd images"
    assert sum(len(r.bboxes_ignore) for r in recs) > 0, "no ignore faces"
    kw = np.concatenate([r.kps[:, :, 2].ravel() for r in recs])
    assert (kw == 0).any(), "no occluded (invisible) landmarks"


def test_hard_tier_ignore_semantics(hard_root):
    """Val GT .mat: ignored faces sit in face_bbx_list but in NO keep
    list, and predicting them is neither TP nor FP — predicting every
    face (kept + ignored) still scores AP 1.0 (reference
    widerface.py:183-220 ignore branch)."""
    from yunet_tpu.data.labelv2 import parse_labelv2
    from yunet_tpu.eval.widerface import load_gt, wider_evaluation

    fb, ev_list, fl, gt_lists = load_gt(str(hard_root / "val" / "gt"))
    n_faces = n_kept = 0
    for i in range(len(ev_list)):
        for j in range(len(fb[i][0])):
            n_faces += len(fb[i][0][j][0])
            n_kept += len(gt_lists["hard"][i][0][j][0])
    assert n_kept < n_faces, "no ignored faces in val GT"

    recs = parse_labelv2(str(hard_root / "val" / "labelv2.txt"),
                         test_mode=True)
    pred = {}
    for r in recs:
        event, fname = r.filename.split("/")
        stem = os.path.splitext(fname)[0]
        allb = np.concatenate([r.bboxes, r.bboxes_ignore], 0)
        xywh = np.concatenate([allb[:, :2], allb[:, 2:4] - allb[:, :2]], 1)
        scores = np.linspace(0.95, 0.5, len(xywh))[:, None]
        pred.setdefault(event, {})[stem] = np.concatenate(
            [xywh, scores], 1).astype(np.float64)
    aps = wider_evaluation(pred, str(hard_root / "val" / "gt"))
    for ap in aps:
        assert ap > 0.99, aps


def test_hard_tier_trains_through_data_layer(hard_root):
    """A hard-tier sample flows through the real aug path (crowds can
    exceed the wire GT budget; overflow keeps the largest faces)."""
    from yunet_tpu.data.dataset import SampleSpec, WiderFaceDataset

    ds = WiderFaceDataset(str(hard_root / "train" / "labelv2.txt"),
                          str(hard_root / "train" / "images"),
                          SampleSpec())
    rng = np.random.RandomState(0)
    for i in range(len(ds.records)):
        s = ds.get_train_sample(i, rng)
        assert s["image"].shape == (640, 640, 3)
        assert s["gt_valid"].sum() >= 1
