"""Evaluation protocol tests: synthetic .mat GT round-trip through the full
wider_evaluation, native wider_match semantics, voc_ap, eval_map."""

import numpy as np
import pytest

from yunet_tpu import native
from yunet_tpu.eval.widerface import (wider_evaluation, voc_ap, eval_map,
                                      _img_pr_info, norm_scores)


def _make_gt_dir(tmp_path, events):
    """events: {event_name: [(gt_boxes_xywh, keep_idx_1based), ...]}"""
    from scipy.io import savemat

    e = len(events)
    event_list = np.empty((e, 1), object)
    file_list = np.empty((e, 1), object)
    facebox_list = np.empty((e, 1), object)
    gt_list = np.empty((e, 1), object)
    for i, (name, imgs) in enumerate(events.items()):
        m = len(imgs)
        event_list[i, 0] = np.asarray([name])
        fl = np.empty((m, 1), object)
        fb = np.empty((m, 1), object)
        gl = np.empty((m, 1), object)
        for j, (boxes, keep) in enumerate(imgs):
            fl[j, 0] = np.asarray([f"img{j}"])
            fb[j, 0] = np.asarray(boxes, np.float64).reshape(-1, 4)
            gl[j, 0] = np.asarray(keep, np.float64).reshape(-1, 1)
        file_list[i, 0] = fl
        facebox_list[i, 0] = fb
        gt_list[i, 0] = gl
    savemat(tmp_path / "wider_face_val.mat", {
        "face_bbx_list": facebox_list, "event_list": event_list,
        "file_list": file_list})
    for s in ("easy", "medium", "hard"):
        savemat(tmp_path / f"wider_{s}_val.mat", {"gt_list": gt_list})
    return str(tmp_path)


def test_wider_evaluation_perfect_predictions(tmp_path):
    gts0 = [[10, 10, 20, 20], [50, 50, 30, 30]]
    gts1 = [[5, 5, 15, 15]]
    gt_dir = _make_gt_dir(tmp_path, {
        "0--Ev": [(gts0, [1, 2]), (gts1, [1])]})
    pred = {"0--Ev": {
        "img0": np.asarray([r + [0.9 - 0.1 * i]
                            for i, r in enumerate(gts0)], np.float64),
        "img1": np.asarray([gts1[0] + [0.85]], np.float64),
    }}
    aps = wider_evaluation(pred, gt_dir)
    for ap in aps:
        assert ap > 0.99


def test_wider_evaluation_fp_lowers_ap(tmp_path):
    # an FP ranked between two TPs: recall 0.5 @ p=1, recall 1.0 @ p=2/3
    # -> AP = 0.5*1 + 0.5*(2/3) = 0.8333
    gts0 = [[10, 10, 20, 20], [100, 100, 20, 20]]
    gt_dir = _make_gt_dir(tmp_path, {"0--Ev": [(gts0, [1, 2])]})
    pred = {"0--Ev": {"img0": np.asarray(
        [[10, 10, 20, 20, 0.9], [200, 200, 10, 10, 0.8],
         [100, 100, 20, 20, 0.7]], np.float64)}}
    aps = wider_evaluation(pred, gt_dir)
    np.testing.assert_allclose(aps[0], 0.5 + 0.5 * 2 / 3, atol=2e-3)


def test_wider_evaluation_ignored_face_is_neutral(tmp_path):
    # two faces, only face 1 evaluated; a detection on face 2 must not
    # count as FP nor as recall
    gts0 = [[10, 10, 20, 20], [100, 100, 20, 20]]
    gt_dir = _make_gt_dir(tmp_path, {"0--Ev": [(gts0, [1])]})
    pred = {"0--Ev": {"img0": np.asarray(
        [[10, 10, 20, 20, 0.9], [100, 100, 20, 20, 0.8]], np.float64)}}
    aps = wider_evaluation(pred, gt_dir)
    assert aps[0] > 0.99


def test_wider_match_claim_once():
    # two preds on the same gt: second is a duplicate (no extra recall)
    preds = np.asarray([[0, 0, 10, 10, 0.9], [1, 1, 10, 10, 0.8]],
                       np.float32)
    gts = np.asarray([[0, 0, 10, 10]], np.float32)
    keep = np.asarray([1], np.int32)
    pred_recall, proposal = native.wider_match(preds, gts, keep, 0.5)
    np.testing.assert_array_equal(pred_recall, [1, 1])
    np.testing.assert_array_equal(proposal, [1, 1])


def test_wider_match_native_vs_numpy():
    rng = np.random.RandomState(0)
    for _ in range(5):
        n, m = 20, 6
        p = np.concatenate([rng.uniform(0, 80, (n, 2)),
                            rng.uniform(5, 40, (n, 2)),
                            -np.sort(-rng.uniform(0, 1, (n, 1)), 0)],
                           1).astype(np.float32)
        g = np.concatenate([rng.uniform(0, 80, (m, 2)),
                            rng.uniform(5, 40, (m, 2))], 1).astype(
                                np.float32)
        keep = (rng.uniform(size=m) > 0.3).astype(np.int32)
        a = native.wider_match(p, g, keep, 0.5)
        b = native._wider_match_numpy(p, g, keep, 0.5)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])


def test_img_pr_info_matches_loop():
    rng = np.random.RandomState(1)
    n = 30
    scores = -np.sort(-rng.uniform(0, 1, n))
    proposal = rng.choice([1, -1], n)
    pred_recall = np.maximum.accumulate(rng.randint(0, 5, n))
    got = _img_pr_info(scores, proposal, pred_recall)
    want = np.zeros((1000, 2))
    for t in range(1000):
        thr = 1 - (t + 1) / 1000
        r = np.where(scores >= thr)[0]
        if len(r) == 0:
            continue
        r = r[-1]
        want[t, 0] = (proposal[:r + 1] == 1).sum()
        want[t, 1] = pred_recall[r]
    np.testing.assert_allclose(got, want)


def test_voc_ap_known_values():
    assert voc_ap(np.asarray([1.0]), np.asarray([1.0])) == pytest.approx(1.0)
    # precision 1.0 up to recall 0.5, then 0.5 precision to recall 1.0
    ap = voc_ap(np.asarray([0.5, 1.0]), np.asarray([1.0, 0.5]))
    assert ap == pytest.approx(0.75)


def test_norm_scores_global_minmax():
    pred = {"e": {"a": np.asarray([[0, 0, 1, 1, 2.0]]),
                  "b": np.asarray([[0, 0, 1, 1, 6.0]])}}
    out = norm_scores(pred)
    assert out["e"]["a"][0, -1] == pytest.approx(0.0)
    assert out["e"]["b"][0, -1] == pytest.approx(1.0)


def test_eval_map_simple():
    dets = [np.asarray([[0, 0, 10, 10, 0.9], [50, 50, 60, 60, 0.8]])]
    anns = [{"bboxes": np.asarray([[0., 0., 10., 10.]]),
             "bboxes_ignore": np.zeros((0, 4))}]
    assert eval_map(dets, anns) == pytest.approx(1.0)
    # second det is a pure FP but comes after the TP -> AP still 1.0;
    # flipping scores makes AP 0.5
    dets2 = [np.asarray([[0, 0, 10, 10, 0.7], [50, 50, 60, 60, 0.8]])]
    assert eval_map(dets2, anns) == pytest.approx(0.5)
