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
