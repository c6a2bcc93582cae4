"""SimOTA differential test: static-shape JAX assigner vs a dynamic-shape
numpy oracle implementing the algorithm as described (candidate gating,
BCE(sqrt(p)) + 3*(-log IoU) cost, dynamic-k from top-10 IoU sum, argmin
multi-match resolution)."""

import numpy as np
import jax.numpy as jnp
import pytest

from yunet_tpu.ops import grid_priors, bbox_decode, sim_ota_assign
from yunet_tpu.ops.boxes import fuse_score


def _np_iou(a, b):
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(aa[:, None] + ab[None, :] - inter, 1e-6)


def simota_oracle(scores, priors, decoded, gts, labels, center_radius=2.5,
                  topk=10, iou_w=3.0, cls_w=1.0, eps=1e-7):
    """Dynamic-shape oracle. Returns (fg_mask, matched_gt, matched_iou)."""
    P, C = scores.shape
    G = gts.shape[0]
    INF = 100000.0
    px, py = priors[:, 0], priors[:, 1]
    sx, sy = priors[:, 2], priors[:, 3]
    in_gt = ((px[:, None] > gts[None, :, 0]) & (py[:, None] > gts[None, :, 1])
             & (px[:, None] < gts[None, :, 2])
             & (py[:, None] < gts[None, :, 3]))
    cx = (gts[:, 0] + gts[:, 2]) / 2
    cy = (gts[:, 1] + gts[:, 3]) / 2
    in_ct = ((px[:, None] > cx[None] - center_radius * sx[:, None])
             & (py[:, None] > cy[None] - center_radius * sy[:, None])
             & (px[:, None] < cx[None] + center_radius * sx[:, None])
             & (py[:, None] < cy[None] + center_radius * sy[:, None]))
    valid = (in_gt | in_ct).any(1)
    vidx = np.where(valid)[0]
    nv = len(vidx)
    fg = np.zeros(P, bool)
    mgt = np.zeros(P, np.int32)
    miou = np.zeros(P, np.float32)
    if nv == 0 or G == 0:
        return fg, mgt, miou
    in_both = in_gt[valid] & in_ct[valid]
    ious = _np_iou(decoded[valid], gts)
    iou_cost = -np.log(ious + eps)
    onehot = np.eye(C)[labels]  # (G, C)
    p = np.sqrt(np.clip(scores[valid], 0, 1))[:, None, :]
    t = onehot[None, :, :]
    lp = np.clip(np.log(p), -100, None)
    l1p = np.clip(np.log(1 - p), -100, None)
    cls_cost = -(t * lp + (1 - t) * l1p).sum(-1)
    cost = cls_w * cls_cost + iou_w * iou_cost + (~in_both) * INF

    k_cap = min(topk, nv)
    topk_ious = -np.sort(-ious, axis=0)[:k_cap]
    ks = np.maximum(topk_ious.sum(0).astype(np.int32), 1)
    matching = np.zeros((nv, G), np.uint8)
    for g in range(G):
        idx = np.argsort(cost[:, g], kind="stable")[:ks[g]]
        matching[idx, g] = 1
    multi = matching.sum(1) > 1
    if multi.any():
        best = cost[multi].argmin(1)
        matching[multi] = 0
        matching[np.where(multi)[0], best] = 1
    fg_v = matching.sum(1) > 0
    fg[vidx] = fg_v
    mg = matching.argmax(1)
    mi = (matching * ious).sum(1)
    mgt[vidx[fg_v]] = mg[fg_v]
    miou[vidx[fg_v]] = mi[fg_v]
    return fg, mgt, miou


def _make_case(seed, num_gts, img=160, pad_to=16):
    rng = np.random.RandomState(seed)
    sizes = [(img // s, img // s) for s in (8, 16, 32)]
    priors = grid_priors(sizes, [8, 16, 32], 0.0)
    P = priors.shape[0]
    cls_l = rng.randn(P, 1).astype(np.float32) * 2
    obj_l = rng.randn(P).astype(np.float32) * 2
    bbox_p = rng.randn(P, 4).astype(np.float32) * 0.5
    c = rng.uniform(20, img - 20, (num_gts, 2))
    wh = rng.uniform(8, 60, (num_gts, 2))
    gts = np.concatenate([c - wh / 2, c + wh / 2], -1).astype(np.float32)
    labels = np.zeros(num_gts, np.int32)
    return priors, cls_l, obj_l, bbox_p, gts, labels, pad_to


@pytest.mark.parametrize("seed,num_gts", [(0, 3), (1, 7), (2, 1), (3, 12)])
def test_simota_matches_oracle(seed, num_gts):
    priors, cls_l, obj_l, bbox_p, gts, labels, pad_to = _make_case(
        seed, num_gts)
    scores = np.asarray(fuse_score(jnp.asarray(cls_l),
                                   jnp.asarray(obj_l)[:, None]))
    offset_priors = np.concatenate(
        [priors[:, :2] + priors[:, 2:] * 0.5, priors[:, 2:]], -1)
    decoded = np.asarray(bbox_decode(jnp.asarray(priors),
                                     jnp.asarray(bbox_p)))

    want_fg, want_gt, want_iou = simota_oracle(
        scores, offset_priors, decoded, gts, labels)

    # padded static-shape inputs for the jax version
    g_pad = pad_to
    gts_p = np.zeros((g_pad, 4), np.float32)
    gts_p[:num_gts] = gts
    labels_p = np.zeros((g_pad,), np.int32)
    valid = np.arange(g_pad) < num_gts

    res = sim_ota_assign(
        jnp.asarray(scores), jnp.asarray(offset_priors),
        jnp.asarray(decoded), jnp.asarray(gts_p), jnp.asarray(labels_p),
        jnp.asarray(valid))
    got_fg = np.asarray(res.fg_mask)
    got_gt = np.asarray(res.matched_gt)
    got_iou = np.asarray(res.matched_iou)

    np.testing.assert_array_equal(got_fg, want_fg)
    np.testing.assert_array_equal(got_gt[got_fg], want_gt[want_fg])
    np.testing.assert_allclose(got_iou[got_fg], want_iou[want_fg],
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("seed,num_gts", [(0, 3), (1, 7), (2, 1), (3, 12),
                                          (4, 5), (7, 9)])
def test_simota_matches_reference_torch(seed, num_gts):
    """Differential gate vs a torch transcription of the reference
    SimOTAAssigner (sim_ota_assigner.py:95-257) — hardens the self-written
    numpy oracle above against a shared misreading (round-1 weak #6)."""
    import torch
    from ref_oracles import ref_simota

    priors, cls_l, obj_l, bbox_p, gts, labels, pad_to = _make_case(
        seed, num_gts)
    scores = np.asarray(fuse_score(jnp.asarray(cls_l),
                                   jnp.asarray(obj_l)[:, None]))
    offset_priors = np.concatenate(
        [priors[:, :2] + priors[:, 2:] * 0.5, priors[:, 2:]], -1)
    decoded = np.asarray(bbox_decode(jnp.asarray(priors),
                                     jnp.asarray(bbox_p)))

    want_inds, want_iou = ref_simota(
        torch.from_numpy(scores), torch.from_numpy(offset_priors),
        torch.from_numpy(decoded), torch.from_numpy(gts),
        torch.from_numpy(labels))
    want_inds = want_inds.numpy()
    want_iou = want_iou.numpy()

    gts_p = np.zeros((pad_to, 4), np.float32)
    gts_p[:num_gts] = gts
    res = sim_ota_assign(
        jnp.asarray(scores), jnp.asarray(offset_priors),
        jnp.asarray(decoded), jnp.asarray(gts_p),
        jnp.zeros((pad_to,), jnp.int32),
        jnp.asarray(np.arange(pad_to) < num_gts))
    got_fg = np.asarray(res.fg_mask)
    got_gt = np.asarray(res.matched_gt)
    got_iou = np.asarray(res.matched_iou)

    np.testing.assert_array_equal(got_fg, want_inds > 0)
    np.testing.assert_array_equal(got_gt[got_fg], want_inds[got_fg] - 1)
    np.testing.assert_allclose(got_iou[got_fg], want_iou[got_fg],
                               rtol=1e-5, atol=1e-6)


def test_simota_no_gts():
    priors, cls_l, obj_l, bbox_p, gts, labels, _ = _make_case(5, 2)
    scores = np.asarray(fuse_score(jnp.asarray(cls_l),
                                   jnp.asarray(obj_l)[:, None]))
    decoded = np.asarray(bbox_decode(jnp.asarray(priors),
                                     jnp.asarray(bbox_p)))
    res = sim_ota_assign(
        jnp.asarray(scores), jnp.asarray(priors), jnp.asarray(decoded),
        jnp.zeros((8, 4)), jnp.zeros((8,), jnp.int32),
        jnp.zeros((8,), bool))
    assert not bool(np.asarray(res.fg_mask).any())


def test_streamed_pallas_matches_xla_batched():
    """The streaming Pallas SimOTA (interpret mode on CPU) must agree
    exactly with the dense XLA formulation — fg mask, matched GT
    (including multi-match tie-breaking), and matched IoU."""
    from yunet_tpu.ops.assign import sim_ota_assign_batched

    rng = np.random.RandomState(7)
    for trial, (b, p, g, pvalid) in enumerate(
            [(2, 300, 12, 0.8), (1, 150, 9, 0.4), (2, 260, 8, 0.0)]):
        pri = np.stack([rng.uniform(0, 320, p), rng.uniform(0, 320, p),
                        np.full(p, 8.0), np.full(p, 8.0)], -1)
        pri = pri.astype(np.float32)
        scores = rng.uniform(1e-4, 1, (b, p, 1)).astype(np.float32)
        c = rng.uniform(20, 300, (b, p, 2))
        wh = rng.uniform(4, 80, (b, p, 2))
        dec = np.concatenate([c - wh / 2, c + wh / 2], -1).astype(
            np.float32)
        gc = rng.uniform(20, 300, (b, g, 2))
        gwh = rng.uniform(8, 100, (b, g, 2))
        gtb = np.concatenate([gc - gwh / 2, gc + gwh / 2], -1).astype(
            np.float32)
        glab = np.zeros((b, g), np.int32)
        gv = rng.uniform(size=(b, g)) < pvalid
        args = (jnp.asarray(scores), jnp.asarray(pri), jnp.asarray(dec),
                jnp.asarray(gtb), jnp.asarray(glab), jnp.asarray(gv))
        r_x = sim_ota_assign_batched(*args, use_pallas=False)
        r_p = sim_ota_assign_batched(*args, use_pallas=True)
        np.testing.assert_array_equal(np.asarray(r_x.fg_mask),
                                      np.asarray(r_p.fg_mask),
                                      err_msg=f"trial {trial}")
        np.testing.assert_array_equal(np.asarray(r_x.matched_gt),
                                      np.asarray(r_p.matched_gt),
                                      err_msg=f"trial {trial}")
        np.testing.assert_allclose(np.asarray(r_x.matched_iou),
                                   np.asarray(r_p.matched_iou),
                                   rtol=1e-6, atol=1e-7,
                                   err_msg=f"trial {trial}")


def test_streamed_pallas_multichunk_multitile(monkeypatch):
    """Cover the kernel's multi-chunk (prior chunks) and multi-GT-tile
    paths, which production shapes exercise (P=8400 -> 3 chunks of 2816,
    G=128 -> 8 tiles of 16) but the default-constant test above does not
    (p < T_CHUNK, g < GT_TILE). Shrinks the tile constants so the same
    code paths run fast in interpret mode, and checks the folded 2-D
    grid against the 4-D grid kernel AND the XLA oracle."""
    from yunet_tpu.ops import simota_pallas
    from yunet_tpu.ops.assign import sim_ota_assign_batched

    monkeypatch.setattr(simota_pallas, "T_CHUNK", 128)
    monkeypatch.setattr(simota_pallas, "GT_TILE", 8)

    rng = np.random.RandomState(11)
    b, p, g = 2, 300, 20        # 3 chunks (128*3=384), 3 gt tiles (24)
    pri = np.stack([rng.uniform(0, 320, p), rng.uniform(0, 320, p),
                    np.full(p, 8.0), np.full(p, 8.0)], -1).astype(
        np.float32)
    scores = rng.uniform(1e-4, 1, (b, p, 1)).astype(np.float32)
    c = rng.uniform(20, 300, (b, p, 2))
    wh = rng.uniform(4, 80, (b, p, 2))
    dec = np.concatenate([c - wh / 2, c + wh / 2], -1).astype(np.float32)
    gc = rng.uniform(20, 300, (b, g, 2))
    gwh = rng.uniform(8, 100, (b, g, 2))
    gtb = np.concatenate([gc - gwh / 2, gc + gwh / 2], -1).astype(
        np.float32)
    gv = rng.uniform(size=(b, g)) < 0.6
    args = (jnp.asarray(scores), jnp.asarray(pri), jnp.asarray(dec),
            jnp.asarray(gtb), jnp.zeros((b, g), jnp.int32),
            jnp.asarray(gv))

    import jax

    r_x = sim_ota_assign_batched(*args, use_pallas=False)
    from yunet_tpu.ops.simota_pallas import streamed_simota
    for folded in (True, False):
        sa = streamed_simota(
            scores[..., 0], pri, dec, gtb,
            np.ones((b, g), np.float32), np.asarray(gv),
            folded=folded, interpret=True)
        from yunet_tpu.ops.assign import _assemble_streamed
        r_p = jax.vmap(_assemble_streamed)(
            sa.valid_prior, sa.best_gt, sa.cand_idx, sa.topk_iou,
            jnp.asarray(gtb), jnp.asarray(gv), jnp.asarray(dec))
        np.testing.assert_array_equal(np.asarray(r_x.fg_mask),
                                      np.asarray(r_p.fg_mask),
                                      err_msg=f"folded={folded}")
        np.testing.assert_array_equal(np.asarray(r_x.matched_gt),
                                      np.asarray(r_p.matched_gt),
                                      err_msg=f"folded={folded}")
        np.testing.assert_allclose(np.asarray(r_x.matched_iou),
                                   np.asarray(r_p.matched_iou),
                                   rtol=1e-6, atol=1e-7,
                                   err_msg=f"folded={folded}")
