"""Streaming SimOTA assignment as a single Pallas TPU kernel.

The XLA formulation of SimOTA (ops/assign.py) materializes several
(B, P, G) f32 matrices in HBM (pair masks, IoU, cls cost, cost) and then
re-scans the cost/IoU matrices k times for the per-GT top-k — at
640², batch 64, G=128 that is ~17 ms/step of mostly HBM traffic and
dense work on *padded* GT columns (a typical crop has ~10 real faces in
a 128-slot pad).

This kernel restructures the whole assignment as one streaming pass:

  grid = (batch, prior-chunks, phase, gt-tiles)        [all sequential]
  - per step it loads a (4, T) chunk of priors/decoded boxes and a
    (GT_TILE, 4) tile of GT boxes — a few KB — and computes the
    (GT_TILE, T) pair quantities entirely in VMEM/registers;
  - phase 0 accumulates valid_prior (= in any GT box or center region,
    sim_ota_assigner.py:186-228) for the chunk, which phase 1 needs for
    the BIG-tier cost masking;
  - phase 1 computes the exact cost tile and folds it into per-GT
    running top-k buffers (cost value+index, and top-k IoU values for
    dynamic-k) held in VMEM scratch, plus a per-prior running
    argmin-cost GT ("best_gt") for multi-match resolution;
  - GT tiles with no valid GT are skipped entirely (@pl.when), so work
    scales with *real* faces, not the padding.

Nothing of size (P, G) ever touches HBM. Outputs are the small
decision tensors: valid_prior (P,), best_gt (P,), per-GT candidate
indices (G, k) and top-k IoU values (G, k). The final matching
(dynamic-k take, scatter, multi-match resolution, matched IoU) is a few
KB of work done in plain XLA by the caller (ops/assign.py).

Numerics replicate ops/assign.py expression-for-expression (same IoU,
same torch-clamped BCE cost, same tie-breaking: ties to the lower prior
index via buffers kept in selection order ahead of ascending-index
tiles). Reference algorithm: sim_ota_assigner.py:95-257.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 100000.0
BIG = 1e9

T_CHUNK = 2816      # priors per chunk (22 lane-tiles; 3 chunks cover P=8400 with 48 pad rows vs 1840 at 2048)
GT_TILE = 16        # GT rows per tile (sublanes)


class StreamedAssign(NamedTuple):
    valid_prior: jnp.ndarray   # (B, P) bool
    best_gt: jnp.ndarray       # (B, P) i32 argmin-cost GT per prior
    cand_idx: jnp.ndarray      # (B, G, k) i32 per-GT k smallest-cost priors
    topk_iou: jnp.ndarray      # (B, G, k) f32 per-GT k largest IoUs, desc


def _topk_merge_min(buf_v, buf_i, tile_v, tile_i, k):
    """Fold a (GT, T) tile into the running k-smallest buffer (GT, k).

    Equal values resolve to the earlier concat position; the buffer is
    kept in selection order (ascending value, ascending index among
    equals) and precedes the tile (which is in ascending-index order),
    so global ties resolve to the lower prior index — exactly
    ops/assign.py:_iter_topk_min_idx / lax.top_k semantics.
    """
    mv = jnp.concatenate([buf_v, tile_v], axis=1)
    mi = jnp.concatenate([buf_i, tile_i], axis=1)
    iota = jax.lax.broadcasted_iota(jnp.int32, mv.shape, 1)
    big_i = jnp.iinfo(jnp.int32).max
    vs, is_ = [], []
    for _ in range(k):
        m = jnp.min(mv, axis=1)
        # first-occurrence argmin (Mosaic's argmin does not guarantee
        # XLA's ties-to-lowest-index rule): lowest position achieving m
        a = jnp.min(jnp.where(mv == m[:, None], iota, big_i), axis=1)
        hit = iota == a[:, None]
        vs.append(m)
        is_.append(jnp.sum(jnp.where(hit, mi, 0), axis=1))
        mv = jnp.where(hit, jnp.inf, mv)
    return jnp.stack(vs, axis=1), jnp.stack(is_, axis=1)


def _topk_merge_max(buf_v, tile_v, k):
    """k largest values (descending); ties irrelevant (values are summed)."""
    mv = jnp.concatenate([buf_v, tile_v], axis=1)
    iota = jax.lax.broadcasted_iota(jnp.int32, mv.shape, 1)
    big_i = jnp.iinfo(jnp.int32).max
    vs = []
    for _ in range(k):
        m = jnp.max(mv, axis=1)
        a = jnp.min(jnp.where(mv == m[:, None], iota, big_i), axis=1)
        vs.append(m)
        mv = jnp.where(iota == a[:, None], -jnp.inf, mv)
    return jnp.stack(vs, axis=1)


def _pair_masks(pri, gtb, gtv, center_radius):
    """(GT_TILE, T) in-gt-box / in-center-region masks
    (sim_ota_assigner.py:186-228)."""
    px, py, sx, sy = (pri[0:1, :], pri[1:2, :], pri[2:3, :], pri[3:4, :])
    x1, y1, x2, y2 = (gtb[:, 0:1], gtb[:, 1:2], gtb[:, 2:3], gtb[:, 3:4])
    in_gts = (jnp.minimum(jnp.minimum(px - x1, py - y1),
                          jnp.minimum(x2 - px, y2 - py)) > 0) & gtv
    cx = (x1 + x2) * 0.5
    cy = (y1 + y2) * 0.5
    r = center_radius
    in_cts = (jnp.minimum(
        jnp.minimum(px - (cx - r * sx), py - (cy - r * sy)),
        jnp.minimum((cx + r * sx) - px, (cy + r * sy) - py)) > 0) & gtv
    return in_gts, in_cts


def _kernel(n_chunks, n_gtiles, k, center_radius, iou_weight, cls_weight,
            eps,
            priors_ref, dec_ref, sc_ref, gtb_ref, gty_ref, gtv_ref,
            valid_out, best_out, cand_out, iouk_out,
            valid_s, bestv_s, besti_s, bufv_s, bufi_s, ioub_s):
    j = pl.program_id(1)       # prior chunk
    ph = pl.program_id(2)      # 0: valid_prior, 1: cost + top-k
    g = pl.program_id(3)       # gt tile
    pri = priors_ref[...]              # (4, T)
    t = pri.shape[1]
    gtb = gtb_ref[0]                   # (GT, 4)
    gt = gtb.shape[0]
    gtv_f = gtv_ref[0]                 # (GT, 1) f32
    gtv = gtv_f > 0
    live = jnp.max(gtv_f) > 0
    gsl = pl.dslice(g * gt, gt)

    # ---- one-time scratch init (per batch element) ------------------------
    @pl.when((j == 0) & (ph == 0) & (g == 0))
    def _():
        bufv_s[...] = jnp.full_like(bufv_s[...], jnp.inf)
        bufi_s[...] = jnp.zeros_like(bufi_s[...])
        ioub_s[...] = jnp.zeros_like(ioub_s[...])

    # ---- phase 0: valid_prior for this chunk -------------------------------
    @pl.when((ph == 0) & (g == 0))
    def _():
        valid_s[...] = jnp.zeros_like(valid_s[...])

    @pl.when((ph == 0) & live)
    def _():
        in_gts, in_cts = _pair_masks(pri, gtb, gtv, center_radius)
        any_g = jnp.any(in_gts | in_cts, axis=0, keepdims=True)
        valid_s[...] = valid_s[...] | any_g.astype(jnp.int32)

    # ---- phase 1: cost tile + running reductions ---------------------------
    @pl.when((ph == 1) & (g == 0))
    def _():
        bestv_s[...] = jnp.full_like(bestv_s[...], jnp.inf)
        besti_s[...] = jnp.zeros_like(besti_s[...])

    @pl.when((ph == 1) & live)
    def _():
        valid_p = valid_s[...] > 0                 # (1, T)
        in_gts, in_cts = _pair_masks(pri, gtb, gtv, center_radius)
        in_both = in_gts & in_cts

        # pairwise IoU, expression-identical to ops/boxes.py:pairwise_iou
        dec = dec_ref[0]                           # (4, T)
        dx1, dy1, dx2, dy2 = (dec[0:1, :], dec[1:2, :],
                              dec[2:3, :], dec[3:4, :])
        gx1, gy1, gx2, gy2 = (gtb[:, 0:1], gtb[:, 1:2],
                              gtb[:, 2:3], gtb[:, 3:4])
        iw = jnp.clip(jnp.minimum(dx2, gx2) - jnp.maximum(dx1, gx1), 0)
        ih = jnp.clip(jnp.minimum(dy2, gy2) - jnp.maximum(dy1, gy1), 0)
        inter = iw * ih
        area_d = jnp.clip(dx2 - dx1, 0) * jnp.clip(dy2 - dy1, 0)
        area_g = jnp.clip(gx2 - gx1, 0) * jnp.clip(gy2 - gy1, 0)
        iou = inter / jnp.maximum(area_d + area_g - inter, 1e-6)
        iou = jnp.where(valid_p & gtv, iou, 0.0)   # (GT, T)
        iou_cost = -jnp.log(iou + eps)

        # cls cost: BCE(sqrt(score), onehot) with torch's -100 log clamp
        # (ops/losses.py:bce_probs); single foreground class.
        s = jnp.sqrt(jnp.clip(sc_ref[0], 0.0, 1.0))          # (1, T)
        y = gty_ref[0]                                       # (GT, 1)
        log_p = jnp.clip(jnp.log(s), -100.0, None)
        log_1mp = jnp.clip(jnp.log1p(-s), -100.0, None)
        cls_cost = -(y * log_p + (1.0 - y) * log_1mp)        # (GT, T)

        cost = (cls_weight * cls_cost + iou_weight * iou_cost
                + jnp.logical_not(in_both).astype(jnp.float32) * INF)
        cost = jnp.where(valid_p, cost, BIG)
        cost = jnp.where(gtv, cost, BIG)

        # per-prior argmin-cost GT; first-occurrence on ties to match
        # XLA argmin (ties to the lowest GT index)
        tmin = jnp.min(cost, axis=0, keepdims=True)          # (1, T)
        rows = jax.lax.broadcasted_iota(jnp.int32, cost.shape, 0)
        targ = jnp.min(jnp.where(cost == tmin, rows,
                                 jnp.iinfo(jnp.int32).max),
                       axis=0, keepdims=True)
        upd = tmin < bestv_s[...]
        besti_s[...] = jnp.where(upd, g * gt + targ, besti_s[...])
        bestv_s[...] = jnp.where(upd, tmin, bestv_s[...])

        # fold into per-GT top-k buffers
        gidx = jax.lax.broadcasted_iota(jnp.int32, (gt, t), 1) + j * t
        nv, ni = _topk_merge_min(bufv_s[gsl, :], bufi_s[gsl, :],
                                 cost, gidx, k)
        bufv_s[gsl, :] = nv
        bufi_s[gsl, :] = ni
        ioub_s[gsl, :] = _topk_merge_max(ioub_s[gsl, :], iou, k)

    # skipped tiles still contribute their uniform-BIG column to best_gt
    # (the XLA argmin sees BIG entries for invalid GTs; ties -> lower idx)
    @pl.when((ph == 1) & jnp.logical_not(live))
    def _():
        upd = BIG < bestv_s[...]
        besti_s[...] = jnp.where(
            upd, jnp.full_like(besti_s[...], g * gt), besti_s[...])
        bestv_s[...] = jnp.where(upd, BIG, bestv_s[...])

    # ---- output writes ------------------------------------------------------
    @pl.when((ph == 1) & (g == n_gtiles - 1))
    def _():
        valid_out[...] = valid_s[...][None]
        best_out[...] = besti_s[...][None]

    @pl.when((j == n_chunks - 1) & (ph == 1))
    def _():
        cand_out[...] = bufi_s[gsl, :][None]
        iouk_out[...] = ioub_s[gsl, :][None]


def _kernel_folded(n_chunks, n_gtiles, gt_t, k, center_radius, iou_weight,
                   cls_weight, eps,
                   priors_ref, dec_ref, sc_ref, gtb_ref, gty_ref, gtv_ref,
                   valid_out, best_out, cand_out, iouk_out,
                   bufv_s, bufi_s, ioub_s):
    """One grid step per (batch element, prior chunk); the two phases and
    the GT-tile loop run inside the body. 16x fewer grid steps than the
    4-D grid (TPU sequential-grid dispatch overhead dominated the v1
    kernel: 10240 steps at 640^2 b128), same numbers in the same order,
    so tie-breaking is preserved tile-for-tile."""
    j = pl.program_id(1)
    pri = priors_ref[...]                  # (4, T)
    t = pri.shape[1]

    @pl.when(j == 0)
    def _():
        bufv_s[...] = jnp.full_like(bufv_s[...], jnp.inf)
        bufi_s[...] = jnp.zeros_like(bufi_s[...])
        ioub_s[...] = jnp.zeros_like(ioub_s[...])

    def load_tile(gi):
        gsl = pl.dslice(gi * gt_t, gt_t)
        gtb = gtb_ref[0, gsl, :]           # (gt_t, 4)
        gtv_f = gtv_ref[0, gsl, :]         # (gt_t, 1)
        return gsl, gtb, gtv_f

    # ---- phase A: valid_prior over all GT tiles ---------------------------
    # carries are i32, not bool: Mosaic assigns inconsistent packed/unpacked
    # i1 vector layouts across cond branches and fails to lower
    def phase_a(gi, valid):
        _, gtb, gtv_f = load_tile(gi)

        def live_fn(v):
            in_gts, in_cts = _pair_masks(pri, gtb, gtv_f > 0, center_radius)
            any_g = jnp.any(in_gts | in_cts, axis=0, keepdims=True)
            return v | any_g.astype(jnp.int32)
        return jax.lax.cond(jnp.max(gtv_f) > 0, live_fn, lambda v: v, valid)

    valid_i = jax.lax.fori_loop(
        0, n_gtiles, phase_a, jnp.zeros((1, t), jnp.int32))
    valid_p = valid_i > 0

    # ---- phase B: cost tiles + running reductions --------------------------
    def phase_b(gi, carry):
        bestv, besti = carry
        gsl, gtb, gtv_f = load_tile(gi)

        def live_fn(carry):
            bestv, besti = carry
            gtv = gtv_f > 0
            in_gts, in_cts = _pair_masks(pri, gtb, gtv, center_radius)
            in_both = in_gts & in_cts

            dec = dec_ref[0]               # (4, T)
            dx1, dy1, dx2, dy2 = (dec[0:1, :], dec[1:2, :],
                                  dec[2:3, :], dec[3:4, :])
            gx1, gy1, gx2, gy2 = (gtb[:, 0:1], gtb[:, 1:2],
                                  gtb[:, 2:3], gtb[:, 3:4])
            iw = jnp.clip(jnp.minimum(dx2, gx2) - jnp.maximum(dx1, gx1), 0)
            ih = jnp.clip(jnp.minimum(dy2, gy2) - jnp.maximum(dy1, gy1), 0)
            inter = iw * ih
            area_d = jnp.clip(dx2 - dx1, 0) * jnp.clip(dy2 - dy1, 0)
            area_g = jnp.clip(gx2 - gx1, 0) * jnp.clip(gy2 - gy1, 0)
            iou = inter / jnp.maximum(area_d + area_g - inter, 1e-6)
            iou = jnp.where(valid_p & gtv, iou, 0.0)
            iou_cost = -jnp.log(iou + eps)

            s = jnp.sqrt(jnp.clip(sc_ref[0], 0.0, 1.0))      # (1, T)
            y = gty_ref[0, gsl, :]                           # (gt_t, 1)
            log_p = jnp.clip(jnp.log(s), -100.0, None)
            log_1mp = jnp.clip(jnp.log1p(-s), -100.0, None)
            cls_cost = -(y * log_p + (1.0 - y) * log_1mp)

            cost = (cls_weight * cls_cost + iou_weight * iou_cost
                    + jnp.logical_not(in_both).astype(jnp.float32) * INF)
            cost = jnp.where(valid_p, cost, BIG)
            cost = jnp.where(gtv, cost, BIG)

            tmin = jnp.min(cost, axis=0, keepdims=True)
            rows = jax.lax.broadcasted_iota(jnp.int32, cost.shape, 0)
            targ = jnp.min(jnp.where(cost == tmin, rows,
                                     jnp.iinfo(jnp.int32).max),
                           axis=0, keepdims=True)
            upd = tmin < bestv
            besti = jnp.where(upd, gi * gt_t + targ, besti)
            bestv = jnp.where(upd, tmin, bestv)

            gidx = jax.lax.broadcasted_iota(jnp.int32, (gt_t, t), 1) + j * t
            nv, ni = _topk_merge_min(bufv_s[gsl, :], bufi_s[gsl, :],
                                     cost, gidx, k)
            bufv_s[gsl, :] = nv
            bufi_s[gsl, :] = ni
            ioub_s[gsl, :] = _topk_merge_max(ioub_s[gsl, :], iou, k)
            return bestv, besti

        def dead_fn(carry):
            bestv, besti = carry
            upd = BIG < bestv
            besti = jnp.where(upd, jnp.full_like(besti, gi * gt_t), besti)
            bestv = jnp.where(upd, BIG, bestv)
            return bestv, besti

        return jax.lax.cond(jnp.max(gtv_f) > 0, live_fn, dead_fn,
                            (bestv, besti))

    bestv, besti = jax.lax.fori_loop(
        0, n_gtiles, phase_b,
        (jnp.full((1, t), jnp.inf, jnp.float32),
         jnp.zeros((1, t), jnp.int32)))

    valid_out[...] = valid_i[None]
    best_out[...] = besti[None]

    @pl.when(j == n_chunks - 1)
    def _():
        cand_out[...] = bufi_s[...][None]
        iouk_out[...] = ioub_s[...][None]


def streamed_simota(scores: jnp.ndarray, priors: jnp.ndarray,
                    decoded: jnp.ndarray, gt_bboxes: jnp.ndarray,
                    gt_onehot: jnp.ndarray, gt_valid: jnp.ndarray, *,
                    center_radius: float = 2.5, k: int = 10,
                    iou_weight: float = 3.0, cls_weight: float = 1.0,
                    eps: float = 1e-7, folded: bool = True,
                    interpret: Optional[bool] = None) -> StreamedAssign:
    """Batched streaming SimOTA reductions.

    scores (B, P) fused probs (single foreground class); priors (P, 4)
    shared across the batch, already +0.5*stride offset;
    decoded (B, P, 4); gt_bboxes (B, G, 4); gt_onehot (B, G) label-0
    one-hot column; gt_valid (B, G) bool.
    """
    b, p = scores.shape
    g_in = gt_bboxes.shape[1]
    t = min(T_CHUNK, max(128, ((p + 127) // 128) * 128))
    n_chunks = -(-p // t)
    pp = n_chunks * t
    gt_t = min(GT_TILE, ((g_in + 7) // 8) * 8)
    n_gtiles = -(-g_in // gt_t)
    gp = n_gtiles * gt_t

    # pad priors so padded rows are in no box/center region, have zero
    # IoU, and (being highest-index) lose every BIG-cost tie to real rows
    pri = jnp.full((pp, 4), -1e9, jnp.float32).at[:p].set(
        priors.astype(jnp.float32))
    dec = jnp.zeros((b, pp, 4), jnp.float32).at[:, :p].set(
        decoded.astype(jnp.float32))
    sc = jnp.zeros((b, pp), jnp.float32).at[:, :p].set(
        scores.astype(jnp.float32))
    gtb = jnp.zeros((b, gp, 4), jnp.float32).at[:, :g_in].set(
        gt_bboxes.astype(jnp.float32))
    gty = jnp.zeros((b, gp, 1), jnp.float32).at[:, :g_in, 0].set(
        gt_onehot.astype(jnp.float32))
    gtv = jnp.zeros((b, gp, 1), jnp.float32).at[:, :g_in, 0].set(
        gt_valid.astype(jnp.float32))

    pri_t = pri.T                       # (4, Pp)
    dec_t = jnp.swapaxes(dec, 1, 2)     # (B, 4, Pp)
    sc_t = sc[:, None, :]               # (B, 1, Pp)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if folded:
        kern = functools.partial(_kernel_folded, n_chunks, n_gtiles, gt_t,
                                 k, center_radius, iou_weight, cls_weight,
                                 eps)
        valid, best, cand, iouk = pl.pallas_call(
            kern,
            grid=(b, n_chunks),
            in_specs=[
                pl.BlockSpec((4, t), lambda b_, j: (0, j)),
                pl.BlockSpec((1, 4, t), lambda b_, j: (b_, 0, j)),
                pl.BlockSpec((1, 1, t), lambda b_, j: (b_, 0, j)),
                pl.BlockSpec((1, gp, 4), lambda b_, j: (b_, 0, 0)),
                pl.BlockSpec((1, gp, 1), lambda b_, j: (b_, 0, 0)),
                pl.BlockSpec((1, gp, 1), lambda b_, j: (b_, 0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, t), lambda b_, j: (b_, 0, j)),
                pl.BlockSpec((1, 1, t), lambda b_, j: (b_, 0, j)),
                pl.BlockSpec((1, gp, k), lambda b_, j: (b_, 0, 0)),
                pl.BlockSpec((1, gp, k), lambda b_, j: (b_, 0, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((b, 1, pp), jnp.int32),
                jax.ShapeDtypeStruct((b, 1, pp), jnp.int32),
                jax.ShapeDtypeStruct((b, gp, k), jnp.int32),
                jax.ShapeDtypeStruct((b, gp, k), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((gp, k), jnp.float32),  # top-k cost values
                pltpu.VMEM((gp, k), jnp.int32),    # top-k cost prior idx
                pltpu.VMEM((gp, k), jnp.float32),  # top-k iou values
            ],
            interpret=interpret,
        )(pri_t, dec_t, sc_t, gtb, gty, gtv)
        return StreamedAssign(
            valid_prior=valid[:, 0, :p] > 0,
            best_gt=best[:, 0, :p],
            cand_idx=cand[:, :g_in, :],
            topk_iou=iouk[:, :g_in, :],
        )

    grid = (b, n_chunks, 2, n_gtiles)
    kern = functools.partial(_kernel, n_chunks, n_gtiles, k,
                             center_radius, iou_weight, cls_weight, eps)
    valid, best, cand, iouk = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, t), lambda b_, j, ph, g: (0, j)),
            pl.BlockSpec((1, 4, t), lambda b_, j, ph, g: (b_, 0, j)),
            pl.BlockSpec((1, 1, t), lambda b_, j, ph, g: (b_, 0, j)),
            pl.BlockSpec((1, gt_t, 4), lambda b_, j, ph, g: (b_, g, 0)),
            pl.BlockSpec((1, gt_t, 1), lambda b_, j, ph, g: (b_, g, 0)),
            pl.BlockSpec((1, gt_t, 1), lambda b_, j, ph, g: (b_, g, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, t), lambda b_, j, ph, g: (b_, 0, j)),
            pl.BlockSpec((1, 1, t), lambda b_, j, ph, g: (b_, 0, j)),
            pl.BlockSpec((1, gt_t, k), lambda b_, j, ph, g: (b_, g, 0)),
            pl.BlockSpec((1, gt_t, k), lambda b_, j, ph, g: (b_, g, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, pp), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, pp), jnp.int32),
            jax.ShapeDtypeStruct((b, gp, k), jnp.int32),
            jax.ShapeDtypeStruct((b, gp, k), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, t), jnp.int32),       # valid (current chunk)
            pltpu.VMEM((1, t), jnp.float32),     # best cost (current chunk)
            pltpu.VMEM((1, t), jnp.int32),       # best gt  (current chunk)
            pltpu.VMEM((gp, k), jnp.float32),    # top-k cost values
            pltpu.VMEM((gp, k), jnp.int32),      # top-k cost prior indices
            pltpu.VMEM((gp, k), jnp.float32),    # top-k iou values
        ],
        interpret=interpret,
    )(pri_t, dec_t, sc_t, gtb, gty, gtv)

    return StreamedAssign(
        valid_prior=valid[:, 0, :p] > 0,
        best_gt=best[:, 0, :p],
        cand_idx=cand[:, :g_in, :],
        topk_iou=iouk[:, :g_in, :],
    )
