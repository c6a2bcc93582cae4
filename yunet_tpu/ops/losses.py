"""Loss primitives: BCE-with-logits, SmoothL1, EIoU.

Elementwise forms; reduction/weighting is composed by the caller (the train
step), replacing the reference's weighted_loss decorator protocol
(models/losses/utils.py). Math parity targets:
  - CrossEntropyLoss(use_sigmoid=True) == F.binary_cross_entropy_with_logits
    (cross_entropy_loss.py:85-146)
  - SmoothL1Loss(beta=1/9) (smooth_l1_loss.py:12-105)
  - EIoULoss / eiou_loss with smooth_point=0.1 (iou_loss.py:175-227) —
    Extended-IoU: an "extent/intersection" IoU' followed by a smooth-L1-like
    transform on (1 - IoU').
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable elementwise binary cross entropy on logits."""
    return (jnp.maximum(logits, 0) - logits * targets +
            jnp.log1p(jnp.exp(-jnp.abs(logits))))


def bce_probs(probs: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """BCE on probabilities, with torch's log clamp at -100
    (F.binary_cross_entropy semantics, used in the SimOTA cls cost)."""
    log_p = jnp.clip(jnp.log(probs), -100.0)
    log_1mp = jnp.clip(jnp.log1p(-probs), -100.0)
    return -(targets * log_p + (1.0 - targets) * log_1mp)


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray,
              beta: float) -> jnp.ndarray:
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def eiou(pred: jnp.ndarray, target: jnp.ndarray, *,
         smooth_point: float = 0.1, eps: float = 1e-6) -> jnp.ndarray:
    """Extended-IoU loss, elementwise over (..., 4) xyxy boxes.

    Follows the construction of the reference eiou_loss
    (iou_loss.py:194-227): intersection built from extent/intersection
    corner combinations, then the smooth transform
      l = 0.5*x^2/sp            if x < sp
          x - 0.5*sp            otherwise,  where x = 1 - IoU'.
    """
    px1, py1, px2, py2 = (pred[..., i] for i in range(4))
    tx1, ty1, tx2, ty2 = (target[..., i] for i in range(4))

    ex1 = jnp.minimum(px1, tx1)
    ey1 = jnp.minimum(py1, ty1)
    ix1 = jnp.maximum(px1, tx1)
    iy1 = jnp.maximum(py1, ty1)
    ix2 = jnp.minimum(px2, tx2)
    iy2 = jnp.minimum(py2, ty2)
    xmin = jnp.minimum(ix1, ix2)
    ymin = jnp.minimum(iy1, iy2)
    xmax = jnp.maximum(ix1, ix2)
    ymax = jnp.maximum(iy1, iy2)

    inter = ((ix2 - ex1) * (iy2 - ey1) + (xmin - ex1) * (ymin - ey1)
             - (ix1 - ex1) * (ymax - ey1) - (xmax - ex1) * (iy1 - ey1))
    union = ((px2 - px1) * (py2 - py1) + (tx2 - tx1) * (ty2 - ty1)
             - inter + eps)
    x = 1.0 - inter / union
    sign = (x < smooth_point).astype(x.dtype)
    sign = jax.lax.stop_gradient(sign)
    return (0.5 * sign * x * x / smooth_point
            + (1.0 - sign) * (x - 0.5 * smooth_point))
