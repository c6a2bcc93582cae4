"""SimOTA label assignment under XLA static shapes.

Re-derivation of the reference SimOTAAssigner
(core/bbox/assigners/sim_ota_assigner.py:95-257) without any
data-dependent shapes:

  * boolean-index compaction of valid priors -> masking with tiered
    infinities (INF for in-candidate-but-not-in-both, BIG for invalid
    priors / padded GTs, so tie-breaking prefers the same priors the
    reference would pick);
  * the python loop over GTs doing per-GT topk -> one batched
    ``lax.top_k`` of size candidate_topk per GT column plus a masked
    scatter (dynamic_k <= candidate_topk because it is the truncated sum
    of the top-10 IoUs);
  * multi-match resolution keeps the reference's exact rule: a prior
    matched to >1 GT is reassigned to the argmin-cost GT over *all*
    columns (sim_ota_assigner.py:244-249).

Shapes: P priors, G max GTs (padded; ``gt_valid`` marks real rows).
Everything is a single fused XLA computation, vmap-able over the batch.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .boxes import pairwise_iou
from .losses import bce_probs

INF = 100000.0       # reference INF for candidates outside box&center
BIG = 1e9            # tier above INF: invalid priors / padded GTs


class AssignResult(NamedTuple):
    fg_mask: jnp.ndarray        # (P,) bool — positive priors
    matched_gt: jnp.ndarray     # (P,) int32 — index into GT rows (0 if bg)
    matched_iou: jnp.ndarray    # (P,) f32 — IoU with the matched GT (0 if bg)


def _iter_topk_max_sum(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Sum of the k largest entries along the last axis.

    Exact, k passes of max+mask — on TPU this is far cheaper than
    lax.top_k, which lowers to a full O(n log n) sort of the whole
    (..., n) operand (the dominant cost of the naive SimOTA step).
    """
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    total = jnp.zeros(x.shape[:-1], x.dtype)
    cur = x
    for _ in range(k):
        total = total + cur.max(axis=-1)
        a = jnp.argmax(cur, axis=-1)
        cur = jnp.where(iota == a[..., None], -jnp.inf, cur)
    return total


def _iter_topk_min_idx(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Indices of the k smallest entries along the last axis, ascending,
    ties resolved to the lower index — the same order lax.top_k(-x)
    produces, without the full sort."""
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    idxs = []
    cur = x
    for _ in range(k):
        a = jnp.argmin(cur, axis=-1)
        idxs.append(a)
        cur = jnp.where(iota == a[..., None], jnp.inf, cur)
    return jnp.stack(idxs, axis=-1)


def _in_box_deltas(px, py, boxes):
    """min over (l, t, r, b) > 0 test, broadcast (P, G)."""
    l = px[:, None] - boxes[None, :, 0]
    t = py[:, None] - boxes[None, :, 1]
    r = boxes[None, :, 2] - px[:, None]
    b = boxes[None, :, 3] - py[:, None]
    return jnp.minimum(jnp.minimum(l, t), jnp.minimum(r, b)) > 0


@partial(jax.jit, static_argnames=("center_radius", "candidate_topk",
                                   "iou_weight", "cls_weight"))
def sim_ota_assign(pred_scores: jnp.ndarray, priors: jnp.ndarray,
                   decoded_bboxes: jnp.ndarray, gt_bboxes: jnp.ndarray,
                   gt_labels: jnp.ndarray, gt_valid: jnp.ndarray, *,
                   center_radius: float = 2.5, candidate_topk: int = 10,
                   iou_weight: float = 3.0, cls_weight: float = 1.0,
                   eps: float = 1e-7) -> AssignResult:
    """Single-image SimOTA.

    Args:
      pred_scores: (P, C) fused probabilities sigmoid(cls)*sigmoid(obj).
      priors: (P, 4) [cx, cy, sw, sh] — already offset by +0.5*stride
        (the head offsets priors for assignment only, yunet_head.py:570-577).
      decoded_bboxes: (P, 4) xyxy.
      gt_bboxes: (G, 4) xyxy, padded.
      gt_labels: (G,) int32, padded.
      gt_valid: (G,) bool.
    """
    p = priors.shape[0]
    g = gt_bboxes.shape[0]
    num_classes = pred_scores.shape[-1]
    px, py = priors[:, 0], priors[:, 1]
    sx, sy = priors[:, 2], priors[:, 3]

    # --- candidate gating (get_in_gt_and_in_center_info, :186-228) --------
    is_in_gts = _in_box_deltas(px, py, gt_bboxes) & gt_valid[None, :]
    cx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) * 0.5
    cy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) * 0.5
    ct_boxes = jnp.stack([
        cx[None, :] - center_radius * sx[:, None],
        cy[None, :] - center_radius * sy[:, None],
        cx[None, :] + center_radius * sx[:, None],
        cy[None, :] + center_radius * sy[:, None]], axis=-1)  # (P, G, 4)
    is_in_cts = (jnp.minimum(
        jnp.minimum(px[:, None] - ct_boxes[..., 0],
                    py[:, None] - ct_boxes[..., 1]),
        jnp.minimum(ct_boxes[..., 2] - px[:, None],
                    ct_boxes[..., 3] - py[:, None])) > 0) \
        & gt_valid[None, :]
    valid_prior = jnp.any(is_in_gts | is_in_cts, axis=1)  # (P,)
    in_both = is_in_gts & is_in_cts                        # (P, G)

    # --- costs (:151-169) --------------------------------------------------
    ious = pairwise_iou(decoded_bboxes, gt_bboxes)         # (P, G)
    ious = jnp.where(valid_prior[:, None] & gt_valid[None, :], ious, 0.0)
    iou_cost = -jnp.log(ious + eps)

    onehot = jax.nn.one_hot(gt_labels, num_classes, dtype=jnp.float32)
    cls_cost = bce_probs(
        jnp.sqrt(jnp.clip(pred_scores, 0.0, 1.0))[:, None, :],
        onehot[None, :, :]).sum(-1)                        # (P, G)

    cost = (cls_weight * cls_cost + iou_weight * iou_cost
            + (~in_both).astype(jnp.float32) * INF)
    cost = jnp.where(valid_prior[:, None], cost, BIG)
    cost = jnp.where(gt_valid[None, :], cost, BIG)

    # --- dynamic-k (:230-243) ----------------------------------------------
    k_cap = min(candidate_topk, p)
    topk_iou_sum = _iter_topk_max_sum(ious.T, k_cap)       # (G,)
    dynamic_ks = jnp.clip(topk_iou_sum.astype(jnp.int32), 1, None)
    dynamic_ks = jnp.where(gt_valid, dynamic_ks, 0)        # (G,)

    # per-GT smallest-cost candidates (ties -> lower prior index, like torch)
    cand_idx = _iter_topk_min_idx(cost.T, k_cap)           # (G, k_cap)
    take = (jnp.arange(k_cap)[None, :] < dynamic_ks[:, None])  # (G, k_cap)
    matching = jnp.zeros((g, p), bool).at[
        jnp.arange(g)[:, None], cand_idx].set(take)
    matching = matching.T                                   # (P, G)

    # --- multi-match resolution (:244-249) ----------------------------------
    multi = matching.sum(axis=1) > 1
    best_gt = jnp.argmin(cost, axis=1)                      # over ALL columns
    only_best = jax.nn.one_hot(best_gt, g, dtype=bool)
    matching = jnp.where(multi[:, None], only_best, matching)

    fg_mask = matching.any(axis=1) & valid_prior
    matched_gt = jnp.argmax(matching, axis=1).astype(jnp.int32)
    matched_iou = (matching * ious).sum(axis=1)
    matched_gt = jnp.where(fg_mask, matched_gt, 0)
    matched_iou = jnp.where(fg_mask, matched_iou, 0.0)
    return AssignResult(fg_mask, matched_gt, matched_iou)


def _assemble_streamed(valid_prior, best_gt, cand_idx, topk_iou,
                       gt_bboxes, gt_valid, decoded, *, eps=1e-6):
    """Final matching from the streamed per-GT top-k reductions
    (ops/simota_pallas.py). Single image; a few KB of work.

    Mirrors the tail of sim_ota_assign: dynamic-k take over the
    ascending-cost candidate list (:142-153), multi-match resolution to
    the argmin-cost GT (:155-159), and fg/matched extraction (:161-165).
    """
    g = gt_bboxes.shape[0]
    p = decoded.shape[0]
    k = cand_idx.shape[1]

    # dynamic-k: truncated sum of the top-k IoUs, summed in descending
    # order to match _iter_topk_max_sum's accumulation order exactly
    tot = topk_iou[:, 0]
    for i in range(1, k):
        tot = tot + topk_iou[:, i]
    dynamic_ks = jnp.clip(tot.astype(jnp.int32), 1, None)
    dynamic_ks = jnp.where(gt_valid, dynamic_ks, 0)          # (G,)
    take = jnp.arange(k)[None, :] < dynamic_ks[:, None]      # (G, k)

    # ONE packed scatter-add instead of two: TPU scatters serialize per
    # index, so halving the scatter count halves this tail. Each taken
    # entry adds (1 << shift) + gt_index; counts (<= G*k) live above
    # `shift`, the gt-index sum (< 2^shift) below — exact as long as both
    # fields fit in an int32, else fall back to two scatters.
    flat = cand_idx.reshape(-1)
    shift = max(1, g * k * (g - 1)).bit_length()
    if g * k << shift < 2 ** 31:
        packed = (take * (jnp.arange(g)[:, None] + (1 << shift))
                  ).reshape(-1)
        acc = jnp.zeros((p,), jnp.int32).at[flat].add(
            packed.astype(jnp.int32))
        count = acc >> shift
        gsum = acc & ((1 << shift) - 1)
    else:
        count = jnp.zeros((p,), jnp.int32).at[flat].add(
            take.reshape(-1).astype(jnp.int32))
        gsum = jnp.zeros((p,), jnp.int32).at[flat].add(
            (take * jnp.arange(g)[:, None]).reshape(-1).astype(jnp.int32))

    fg_mask = (count > 0) & valid_prior
    matched_gt = jnp.where(count > 1, best_gt, gsum)
    matched_gt = jnp.where(fg_mask, matched_gt, 0).astype(jnp.int32)

    # matched IoU: select the matched GT row via a one-hot matmul (the
    # (G,) table gather lowers to a pathological scalar gather on TPU)
    # and recompute the IoU with the exact pairwise_iou expression.
    sel = jax.nn.one_hot(matched_gt, g, dtype=jnp.float32)   # (P, G)
    row = jax.lax.dot(
        sel, jnp.concatenate(
            [gt_bboxes, gt_valid[:, None].astype(jnp.float32)], axis=-1),
        precision=jax.lax.Precision.HIGHEST)
    box, mvalid = row[:, :4], row[:, 4] > 0
    from .boxes import aligned_iou
    iou = aligned_iou(decoded, box, eps=eps)
    matched_iou = jnp.where(fg_mask & mvalid, iou, 0.0)
    return AssignResult(fg_mask, matched_gt, matched_iou)


def sim_ota_assign_batched(pred_scores: jnp.ndarray, priors: jnp.ndarray,
                           decoded_bboxes: jnp.ndarray,
                           gt_bboxes: jnp.ndarray, gt_labels: jnp.ndarray,
                           gt_valid: jnp.ndarray, *,
                           center_radius: float = 2.5,
                           candidate_topk: int = 10,
                           iou_weight: float = 3.0, cls_weight: float = 1.0,
                           eps: float = 1e-7,
                           use_pallas=None) -> AssignResult:
    """Batched SimOTA: pred_scores (B, P, C), priors (P, 4) shared,
    decoded (B, P, 4), gt_* (B, G, ...).

    On TPU (single foreground class) this runs the streaming Pallas
    kernel — no (B, P, G) tensor ever reaches HBM; elsewhere it vmaps
    the dense XLA formulation. ``use_pallas``: None = auto, False =
    force XLA, True = force the kernel (interpreted off-TPU).
    """
    single_class = pred_scores.shape[-1] == 1
    if use_pallas is None:
        use_pallas = single_class and jax.default_backend() == "tpu"
    if use_pallas and not single_class:
        raise ValueError("pallas SimOTA kernel requires num_classes == 1")
    if not use_pallas:
        return jax.vmap(partial(
            sim_ota_assign, center_radius=center_radius,
            candidate_topk=candidate_topk, iou_weight=iou_weight,
            cls_weight=cls_weight, eps=eps),
            in_axes=(0, None, 0, 0, 0, 0))(
            pred_scores, priors, decoded_bboxes, gt_bboxes, gt_labels,
            gt_valid)

    from .simota_pallas import streamed_simota
    sa = streamed_simota(
        pred_scores[..., 0], priors, decoded_bboxes, gt_bboxes,
        (gt_labels == 0).astype(jnp.float32), gt_valid,
        center_radius=center_radius, k=candidate_topk,
        iou_weight=iou_weight, cls_weight=cls_weight, eps=eps,
        interpret=None if jax.default_backend() == "tpu" else True)
    return jax.vmap(_assemble_streamed)(
        sa.valid_prior, sa.best_gt, sa.cand_idx, sa.topk_iou,
        gt_bboxes, gt_valid, decoded_bboxes)
