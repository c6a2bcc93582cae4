"""Greedy NMS as a single Pallas TPU kernel.

The lax.fori_loop NMS in ops/nms.py pays per-iteration XLA while-loop
overhead (~5ms for 750 candidates on v5e). Here the entire sequential
suppression runs inside one kernel: candidate boxes live in VMEM as four
(1, K) coordinate rows, and each of the K steps does one VPU-wide IoU
against all candidates — no kernel-launch or loop overhead between steps.

Semantics identical to ops/nms.device_nms (and mmcv's C++ nms): candidates
pre-sorted by score descending; box i survives iff no earlier surviving box
overlaps it with IoU > thr.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _nms_kernel(iou_thr: float, k: int, boxes_ref, valid_ref, keep_ref):
    x1 = boxes_ref[0:1, :]
    y1 = boxes_ref[1:2, :]
    x2 = boxes_ref[2:3, :]
    y2 = boxes_ref[3:4, :]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    col = jax.lax.broadcasted_iota(jnp.int32, x1.shape, 1)

    def body(i, suppressed):
        # scalar extraction via select+reduce (Pallas TC has no
        # dynamic_slice on values)
        sel = (col == i).astype(jnp.float32)
        alive_i = 1.0 - jnp.sum(suppressed * sel)
        bx1 = jnp.sum(x1 * sel)
        by1 = jnp.sum(y1 * sel)
        bx2 = jnp.sum(x2 * sel)
        by2 = jnp.sum(y2 * sel)
        barea = jnp.sum(area * sel)
        iw = jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1)
        ih = jnp.minimum(y2, by2) - jnp.maximum(y1, by1)
        inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)
        iou = inter / jnp.maximum(area + barea - inter, 1e-9)
        hit = jnp.where((iou > iou_thr) & (col > i), alive_i, 0.0)
        return jnp.maximum(suppressed, hit)

    suppressed = jax.lax.fori_loop(
        0, k, body, jnp.zeros(x1.shape, jnp.float32))
    keep_ref[:, :] = jnp.where(valid_ref[:, :] > 0.0,
                               1.0 - suppressed, 0.0)


@functools.partial(jax.jit, static_argnames=("top_k", "iou_thr",
                                             "score_thr"))
def pallas_nms(boxes: jnp.ndarray, scores: jnp.ndarray, *, top_k: int,
               iou_thr: float = 0.45, score_thr: float = 0.02):
    """Drop-in replacement for ops.nms.device_nms (same returns)."""
    p = scores.shape[0]
    k = min(top_k, p)
    kp = _round_up(k, LANE)
    valid = scores >= score_thr
    masked = jnp.where(valid, scores, -1.0)
    top_scores, idx = jax.lax.top_k(masked, k)
    top_boxes = boxes[idx].astype(jnp.float32)

    # pad to lane multiple; padded entries invalid with empty boxes
    pad = kp - k
    boxes_rows = jnp.concatenate(
        [top_boxes.T, jnp.zeros((4, pad), jnp.float32)], axis=1)  # (4, kp)
    valid_row = jnp.concatenate(
        [(top_scores >= score_thr).astype(jnp.float32),
         jnp.zeros((pad,), jnp.float32)])[None, :]               # (1, kp)

    keep = pl.pallas_call(
        functools.partial(_nms_kernel, float(iou_thr), k),
        out_shape=jax.ShapeDtypeStruct((1, kp), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(boxes_rows, valid_row)

    dets = jnp.concatenate([top_boxes, top_scores[:, None]], axis=-1)
    return dets, keep[0, :k] > 0.5, idx
