"""Ops tests: priors, decode/encode, IoU, NMS (device vs native vs numpy),
loss primitives vs torch."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yunet_tpu.ops import (grid_priors, bbox_decode, kps_decode, kps_encode,
                           pairwise_iou, device_nms)
from yunet_tpu.ops.losses import bce_with_logits, bce_probs, smooth_l1, eiou
from yunet_tpu import native


def test_grid_priors_layout():
    pri = grid_priors([(4, 4), (2, 2), (1, 1)], [8, 16, 32], offset=0.0)
    assert pri.shape == (21, 4)
    # level 0 row-major: x fastest
    np.testing.assert_allclose(pri[0], [0, 0, 8, 8])
    np.testing.assert_allclose(pri[1], [8, 0, 8, 8])
    np.testing.assert_allclose(pri[4], [0, 8, 8, 8])
    np.testing.assert_allclose(pri[16], [0, 0, 16, 16])
    np.testing.assert_allclose(pri[20], [0, 0, 32, 32])
    pri5 = grid_priors([(2, 2)], [8], offset=0.5)
    np.testing.assert_allclose(pri5[0], [4, 4, 8, 8])


def test_bbox_decode_formula():
    rng = np.random.RandomState(0)
    priors = jnp.asarray(grid_priors([(4, 4)], [8]))
    pred = jnp.asarray(rng.randn(16, 4).astype(np.float32))
    got = np.asarray(bbox_decode(priors, pred))
    p = np.asarray(priors)
    cxy = pred[:, :2] * p[:, 2:] + p[:, :2]
    wh = np.exp(pred[:, 2:]) * p[:, 2:]
    want = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_kps_roundtrip():
    rng = np.random.RandomState(1)
    priors = jnp.asarray(grid_priors([(4, 4)], [8]))
    kps = jnp.asarray(rng.uniform(0, 32, (16, 10)).astype(np.float32))
    enc = kps_encode(priors, kps)
    dec = kps_decode(priors, enc)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(kps), atol=1e-5)


def test_pairwise_iou_basic():
    a = jnp.asarray([[0., 0., 10., 10.], [5., 5., 15., 15.]])
    b = jnp.asarray([[0., 0., 10., 10.], [20., 20., 30., 30.]])
    iou = np.asarray(pairwise_iou(a, b))
    np.testing.assert_allclose(iou[0, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(iou[0, 1], 0.0, atol=1e-6)
    np.testing.assert_allclose(iou[1, 0], 25.0 / 175.0, rtol=1e-5)


def _random_boxes(n, seed, size=200.0):
    rng = np.random.RandomState(seed)
    c = rng.uniform(10, size - 10, (n, 2))
    wh = rng.uniform(2, 60, (n, 2))
    return np.concatenate([c - wh / 2, c + wh / 2], -1).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_nms_device_matches_native(seed):
    n = 200
    boxes = _random_boxes(n, seed)
    scores = np.random.RandomState(seed + 10).uniform(
        0, 1, n).astype(np.float32)
    iou_thr, score_thr = 0.45, 0.02

    keep_native = native.nms(boxes, np.where(scores >= score_thr, scores,
                                             -1), iou_thr)
    keep_native = [i for i in keep_native if scores[i] >= score_thr]

    dets, keep, _ = device_nms(jnp.asarray(boxes), jnp.asarray(scores),
                               top_k=n, iou_thr=iou_thr, score_thr=score_thr)
    dets, keep = np.asarray(dets), np.asarray(keep)
    got = dets[keep]
    want_boxes = boxes[keep_native]
    want_scores = scores[keep_native]
    assert got.shape[0] == len(keep_native)
    np.testing.assert_allclose(got[:, :4], want_boxes, rtol=1e-5)
    np.testing.assert_allclose(got[:, 4], want_scores, rtol=1e-5)


@pytest.mark.parametrize("seed", [0, 3])
def test_pallas_nms_matches_device_nms(seed):
    """Pallas kernel (interpret mode on CPU) == lax fori_loop NMS."""
    from yunet_tpu.ops.nms_pallas import pallas_nms
    n = 300
    boxes = jnp.asarray(_random_boxes(n, seed))
    scores = jnp.asarray(np.random.RandomState(seed + 20).uniform(
        0, 1, n).astype(np.float32))
    d1, k1, i1 = device_nms(boxes, scores, top_k=256, iou_thr=0.45,
                            score_thr=0.02)
    d2, k2, i2 = pallas_nms(boxes, scores, top_k=256, iou_thr=0.45,
                            score_thr=0.02)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-6)


def test_native_nms_matches_numpy_fallback():
    boxes = _random_boxes(300, 7)
    scores = np.random.RandomState(8).uniform(0, 1, 300).astype(np.float32)
    a = native.nms(boxes, scores, 0.45)
    b = native._nms_numpy(boxes, scores, 0.45)
    np.testing.assert_array_equal(a, b)


def test_bce_matches_torch():
    import torch
    rng = np.random.RandomState(3)
    x = rng.randn(100).astype(np.float32) * 5
    t = rng.uniform(0, 1, 100).astype(np.float32)
    got = np.asarray(bce_with_logits(jnp.asarray(x), jnp.asarray(t)))
    want = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(x), torch.from_numpy(t), reduction="none").numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # prob-space BCE with clamp, vs torch F.binary_cross_entropy
    p = rng.uniform(0, 1, 100).astype(np.float32)
    p[:3] = [0.0, 1.0, 0.5]
    got = np.asarray(bce_probs(jnp.asarray(p), jnp.asarray(t)))
    want = torch.nn.functional.binary_cross_entropy(
        torch.from_numpy(p), torch.from_numpy(t), reduction="none").numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_smooth_l1_matches_torch():
    import torch
    rng = np.random.RandomState(4)
    a = rng.randn(50).astype(np.float32)
    b = rng.randn(50).astype(np.float32)
    got = np.asarray(smooth_l1(jnp.asarray(a), jnp.asarray(b), 1.0 / 9.0))
    want = torch.nn.functional.smooth_l1_loss(
        torch.from_numpy(a), torch.from_numpy(b), reduction="none",
        beta=1.0 / 9.0).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_eiou_properties():
    same = jnp.asarray([[0., 0., 10., 10.]])
    l0 = float(eiou(same, same)[0])
    assert l0 < 1e-5
    near = jnp.asarray([[1., 1., 11., 11.]])
    far = jnp.asarray([[8., 8., 18., 18.]])
    l_near = float(eiou(near, same)[0])
    l_far = float(eiou(far, same)[0])
    assert 0 < l_near < l_far
    # smooth region: loss = 0.5*x^2/sp for x < sp
    almost = jnp.asarray([[0., 0., 10., 10.4]])
    x = 1.0 - float(  # IoU' of almost vs same
        (10 * 10) / (10 * 10.4))
    l = float(eiou(almost, same)[0])
    np.testing.assert_allclose(l, 0.5 * x * x / 0.1, rtol=1e-3)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_eiou_matches_reference_formula(seed):
    """Differential gate vs a torch transcription of the reference
    eiou_loss (iou_loss.py:194-227) — values AND gradients."""
    import torch
    from ref_oracles import ref_eiou

    rng = np.random.RandomState(seed)
    n = 256
    c = rng.uniform(-20, 120, (n, 2))
    wh = rng.uniform(0.5, 80, (n, 2))
    pred = np.concatenate([c - wh / 2, c + wh / 2], -1).astype(np.float32)
    c2 = c + rng.uniform(-25, 25, (n, 2))
    wh2 = wh * rng.uniform(0.3, 3.0, (n, 2))
    target = np.concatenate([c2 - wh2 / 2, c2 + wh2 / 2],
                            -1).astype(np.float32)
    # include exact-match and fully-disjoint rows
    target[0] = pred[0]
    target[1] = pred[1] + 500.0

    got = np.asarray(eiou(jnp.asarray(pred), jnp.asarray(target),
                          smooth_point=0.1, eps=1e-6))
    tp = torch.from_numpy(pred).requires_grad_(True)
    want = ref_eiou(tp, torch.from_numpy(target), 0.1, 1e-6)
    np.testing.assert_allclose(got, want.detach().numpy(),
                               rtol=1e-5, atol=1e-6)

    # gradient parity (sum reduction)
    g = np.asarray(jax.grad(
        lambda p: eiou(p, jnp.asarray(target),
                       smooth_point=0.1, eps=1e-6).sum())(jnp.asarray(pred)))
    want.sum().backward()
    np.testing.assert_allclose(g, tp.grad.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("bsz,n,top_k", [(5, 300, 256), (3, 900, 512),
                                         (1, 100, 128), (9, 150, 64)])
def test_pallas_nms_batched_matches_per_image(bsz, n, top_k):
    """One-invocation batched kernel (batch on sublanes, score-order
    tiles) == the per-image kernel for every image in the batch —
    including cross-tile suppression (top_k > one 128 tile), non-8
    batch sizes, and dense overlapping boxes."""
    from yunet_tpu.ops.nms_pallas import pallas_nms, pallas_nms_batched
    rng = np.random.RandomState(41 + bsz)
    boxes = np.stack([_random_boxes(n, 100 * bsz + i) for i in range(bsz)])
    scores = rng.uniform(0, 1, (bsz, n)).astype(np.float32)
    # push some scores below threshold so the valid mask is exercised
    scores[:, :: 7] *= 0.01

    db, kb, ib = pallas_nms_batched(
        jnp.asarray(boxes), jnp.asarray(scores), top_k=top_k,
        iou_thr=0.45, score_thr=0.02)
    for b in range(bsz):
        d1, k1, i1 = pallas_nms(
            jnp.asarray(boxes[b]), jnp.asarray(scores[b]), top_k=top_k,
            iou_thr=0.45, score_thr=0.02)
        np.testing.assert_array_equal(np.asarray(kb)[b], np.asarray(k1),
                                      err_msg=f"image {b}")
        np.testing.assert_array_equal(np.asarray(ib)[b], np.asarray(i1))
        np.testing.assert_allclose(np.asarray(db)[b], np.asarray(d1),
                                   rtol=1e-6)


def test_pallas_nms_dynamic_trip_count_sparse_scores():
    """Mostly-below-threshold scores (the real serving regime) must give
    identical keeps through both Pallas kernels and the lax reference —
    exercises the dynamic loop bound (trip count = valid count, not
    top_k) including the all-invalid image."""
    from yunet_tpu.ops.nms_pallas import pallas_nms, pallas_nms_batched
    rng = np.random.RandomState(77)
    bsz, n = 4, 400
    boxes = np.stack([_random_boxes(n, 200 + i) for i in range(bsz)])
    scores = rng.uniform(0, 0.003, (bsz, n)).astype(np.float32)
    # image 0: 12 real candidates; image 1: 1; image 2: 0; image 3: 60
    for b, cnt in ((0, 12), (1, 1), (2, 0), (3, 60)):
        scores[b, rng.choice(n, cnt, replace=False)] = rng.uniform(
            0.1, 1.0, cnt)

    db, kb, ib = pallas_nms_batched(
        jnp.asarray(boxes), jnp.asarray(scores), top_k=256,
        iou_thr=0.45, score_thr=0.02)
    assert np.asarray(kb)[2].sum() == 0
    for b in range(bsz):
        d1, k1, i1 = pallas_nms(
            jnp.asarray(boxes[b]), jnp.asarray(scores[b]), top_k=256,
            iou_thr=0.45, score_thr=0.02)
        d0, k0, i0 = device_nms(
            jnp.asarray(boxes[b]), jnp.asarray(scores[b]), top_k=256,
            iou_thr=0.45, score_thr=0.02)
        np.testing.assert_array_equal(np.asarray(kb)[b], np.asarray(k1))
        np.testing.assert_array_equal(np.asarray(k1), np.asarray(k0))
        np.testing.assert_array_equal(np.asarray(ib)[b], np.asarray(i1))
