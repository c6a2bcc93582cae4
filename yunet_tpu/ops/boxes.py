"""Box/keypoint decode-encode and IoU — the numerical contract shared by
training, eval, and every exported consumer.

Decode math must bit-match the reference (yunet_head.py:376-409):
  bbox:  cxy = pred[..., :2] * stride + prior_xy
         wh  = exp(pred[..., 2:]) * stride
         corners = cxy -+ wh/2
  kps:   kp_i = pred[..., 2i:2i+2] * stride + prior_xy  (encode = inverse)
  score = sigmoid(cls) * sigmoid(obj)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bbox_decode(priors: jnp.ndarray, bbox_pred: jnp.ndarray) -> jnp.ndarray:
    """priors (..., P, 4) [x, y, sw, sh]; bbox_pred (..., P, 4) -> xyxy."""
    xys = bbox_pred[..., :2] * priors[..., 2:] + priors[..., :2]
    whs = jnp.exp(bbox_pred[..., 2:]) * priors[..., 2:]
    half = whs * 0.5
    return jnp.concatenate([xys - half, xys + half], axis=-1)


def kps_decode(priors: jnp.ndarray, kps_pred: jnp.ndarray) -> jnp.ndarray:
    """kps_pred (..., P, 2K) -> absolute keypoint coords (..., P, 2K)."""
    nk = kps_pred.shape[-1] // 2
    pts = kps_pred.reshape(*kps_pred.shape[:-1], nk, 2)
    pts = pts * priors[..., None, 2:] + priors[..., None, :2]
    return pts.reshape(*kps_pred.shape)


def kps_encode(priors: jnp.ndarray, kps: jnp.ndarray) -> jnp.ndarray:
    """Inverse of kps_decode (reference yunet_head.py:395-402)."""
    nk = kps.shape[-1] // 2
    pts = kps.reshape(*kps.shape[:-1], nk, 2)
    pts = (pts - priors[..., None, :2]) / priors[..., None, 2:]
    return pts.reshape(*kps.shape)


def fuse_score(cls_logit: jnp.ndarray, obj_logit: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.sigmoid(cls_logit) * jax.nn.sigmoid(obj_logit)


# shared IoU denominator floor: pairwise_iou and aligned_iou must stay in
# lockstep (the streamed SimOTA tail recomputes matched IoU via
# aligned_iou; dense SimOTA uses the pairwise matrix)
IOU_EPS = 1e-6


def aligned_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
                eps: float = IOU_EPS) -> jnp.ndarray:
    """Element-wise IoU of aligned (..., 4) xyxy box arrays — the
    is_aligned=True counterpart of pairwise_iou with identical clip/eps
    conventions (mmcv bbox_overlaps, iou2d_calculator.py)."""
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area1 = jnp.clip(boxes1[..., 2] - boxes1[..., 0], 0) * \
        jnp.clip(boxes1[..., 3] - boxes1[..., 1], 0)
    area2 = jnp.clip(boxes2[..., 2] - boxes2[..., 0], 0) * \
        jnp.clip(boxes2[..., 3] - boxes2[..., 1], 0)
    return inter / jnp.maximum(area1 + area2 - inter, eps)


def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
                 eps: float = 1e-6) -> jnp.ndarray:
    """IoU matrix (N, M) between xyxy boxes (no +1 offset — matches mmcv
    bbox_overlaps with is_aligned=False, iou2d_calculator.py)."""
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area1 = jnp.clip(boxes1[..., 2] - boxes1[..., 0], 0) * \
        jnp.clip(boxes1[..., 3] - boxes1[..., 1], 0)
    area2 = jnp.clip(boxes2[..., 2] - boxes2[..., 0], 0) * \
        jnp.clip(boxes2[..., 3] - boxes2[..., 1], 0)
    union = area1[..., :, None] + area2[..., None, :] - inter
    return inter / jnp.maximum(union, eps)
