"""On-device fixed-shape NMS.

Replaces the reference's mmcv C++/CUDA `batched_nms`
(yunet_head.py:404-416) on the jitted inference path. Greedy NMS over the
top-K candidates by score: sort desc, then a `lax.fori_loop` where step i
finalizes box i's keep bit from the running suppression vector and
vectorially suppresses everything it overlaps. Exact greedy semantics
(suppress when IoU > thr), static shapes throughout.

The uncapped / exact path for AP evaluation uses the native C++ kernel
(yunet_tpu/native) on the host instead — mirroring how the reference also
leaves NMS to a C++ op.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("top_k", "iou_thr", "score_thr"))
def device_nms(boxes: jnp.ndarray, scores: jnp.ndarray, *, top_k: int,
               iou_thr: float = 0.45, score_thr: float = 0.02):
    """Single-class greedy NMS.

    Args:
      boxes: (P, 4) xyxy.
      scores: (P,) fused scores.
      top_k: static candidate cap (sorted by score).
    Returns:
      dets: (top_k, 5) [x1 y1 x2 y2 score], score-desc ordering.
      keep: (top_k,) bool — True for surviving, above-threshold boxes.
      idx:  (top_k,) int32 — original indices of the sorted candidates.
    """
    p = scores.shape[0]
    k = min(top_k, p)
    valid = scores >= score_thr
    neg = jnp.asarray(-1.0, scores.dtype)
    masked = jnp.where(valid, scores, neg)
    top_scores, idx = jax.lax.top_k(masked, k)
    top_boxes = boxes[idx]

    x1, y1, x2, y2 = (top_boxes[:, i] for i in range(4))
    area = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)

    def body(i, state):
        suppressed, kept = state
        alive_i = jnp.logical_not(suppressed[i])
        kept = kept.at[i].set(alive_i)
        # IoU of box i against all candidates
        ix1 = jnp.maximum(x1, x1[i])
        iy1 = jnp.maximum(y1, y1[i])
        ix2 = jnp.minimum(x2, x2[i])
        iy2 = jnp.minimum(y2, y2[i])
        inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)
        iou = inter / jnp.maximum(area + area[i] - inter, 1e-9)
        # only a finalized-kept box suppresses; never itself
        idxs = jnp.arange(k)
        suppress = alive_i & (iou > iou_thr) & (idxs > i)
        return suppressed | suppress, kept

    suppressed0 = jnp.zeros((k,), bool)
    kept0 = jnp.zeros((k,), bool)
    # dynamic trip count: candidates are score-sorted, so every
    # below-threshold box sits after every valid one and can only
    # suppress other below-threshold boxes — which the final mask
    # zeroes anyway (same argument as ops/nms_pallas.py). At serving
    # thresholds this cuts the sequential while-loop from top_k steps
    # to the real (usually small) candidate count.
    n = jnp.sum((top_scores >= score_thr).astype(jnp.int32))
    _, kept = jax.lax.fori_loop(0, n, body, (suppressed0, kept0))
    kept = kept & (top_scores >= score_thr)
    dets = jnp.concatenate([top_boxes, top_scores[:, None]], axis=-1)
    return dets, kept, idx
