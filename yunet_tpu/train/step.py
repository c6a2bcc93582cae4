"""Fused training step: forward + SimOTA targets + losses + SGD update.

One jitted SPMD program replaces the reference's Runner/OptimizerHook/DDP
stack (apis/train.py:117-244, base.py:219-267):
  - data parallelism = shard_map over the mesh 'dp' axis; gradient pmean
    replaces NCCL bucket all-reduce;
  - the loss normalizer num_total_samples = max(pmean(num_pos), 1) keeps
    the reference's cross-replica reduce_mean semantics
    (yunet_head.py:493-497);
  - BatchNorm normalizes with *local* shard statistics (the reference's
    per-GPU BN) while the running stats are pmean'd each step (a built-in
    SyncNormHook, sync_norm_hook.py:11-52);
  - losses in f32 regardless of trunk dtype (force_fp32 boundary,
    yunet_head.py:418).

Loss composition parity (yunet_head.py:418-534):
  loss_cls  = sum BCE(cls_logits[fg], onehot*IoU) / N
  loss_obj  = sum BCE(obj_logits, fg)             / N
  loss_bbox = 5.0 * sum EIoU(decoded[fg], gt)     / N
  loss_kps  = 0.1 * sum(SmoothL1(kps_pred[fg], encode(gt)) * w) / sum(w)
  N = max(mean-over-replicas(num_pos), 1)
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..models.detector import YuNet
from ..ops.boxes import bbox_decode, kps_encode
from ..ops.losses import bce_with_logits, eiou, smooth_l1
from ..ops.priors import grid_priors
from .targets import build_targets_batched
from .lr import lr_schedule, scale_lr


class TrainState(NamedTuple):
    params: Any
    state: Any            # BN running stats
    opt_state: Any
    step: jnp.ndarray
    ema_params: Any = None


def make_optimizer(cfg: Config, steps_per_epoch: int, total_batch: int
                   ) -> optax.GradientTransformation:
    lr = (scale_lr(cfg.train.lr, total_batch, cfg.train.base_total_batch)
          if cfg.train.auto_scale_lr else cfg.train.lr)
    sched = lr_schedule(
        lr, steps_per_epoch=steps_per_epoch,
        warmup_iters=cfg.train.warmup_iters,
        warmup_ratio=cfg.train.warmup_ratio,
        decay_epochs=cfg.train.lr_decay_epochs,
        decay_factor=cfg.train.lr_decay_factor)
    parts = []
    if cfg.train.grad_clip > 0:
        parts.append(optax.clip_by_global_norm(cfg.train.grad_clip))
    parts += [
        optax.add_decayed_weights(cfg.train.weight_decay),
        optax.sgd(learning_rate=sched, momentum=cfg.train.momentum),
    ]
    return optax.chain(*parts)


def init_train_state(cfg: Config, *, steps_per_epoch: int, total_batch: int,
                     rng: Optional[jax.Array] = None,
                     params=None, state=None) -> Tuple[TrainState, Any]:
    model = YuNet(cfg.model)
    if params is None:
        rng = rng if rng is not None else jax.random.PRNGKey(cfg.train.seed)
        params, state = model.init(rng)
    params = jax.tree.map(jnp.asarray, params)
    state = jax.tree.map(jnp.asarray, state)
    tx = make_optimizer(cfg, steps_per_epoch, total_batch)
    opt_state = tx.init(params)
    # EMA shadow starts equal to params but must be DISTINCT buffers:
    # ts is donated to the jitted step, and donating the same buffer
    # through two pytree leaves is an invalid-argument error on some
    # backends (aliased params/ema_params leaves).
    ema = (jax.tree.map(jnp.array, params)
           if cfg.train.ema_momentum > 0 else None)
    return TrainState(params, state, opt_state,
                      jnp.zeros((), jnp.int32), ema), tx


def loss_fn(model: YuNet, cfg: Config, params, state,
            batch: Dict[str, jnp.ndarray], priors: jnp.ndarray,
            axis_name: Optional[str] = None):
    """Returns (total_loss, (new_state, metrics))."""
    images = batch["image"]
    if cfg.train.bf16:
        # uint8 -> bf16 is a single cheap cast (0..255 exact in bf16)
        images = images.astype(jnp.bfloat16)
    elif not jnp.issubdtype(images.dtype, jnp.floating):
        images = images.astype(jnp.float32)
    flat, new_state = model.forward_flat(params, state, images, train=True,
                                         fused=cfg.train.fused_kernels,
                                         bn_group=cfg.train.bn_group)
    cls_l = flat["cls"].astype(jnp.float32)       # (B, P, C)
    obj_l = flat["obj"][..., 0].astype(jnp.float32)  # (B, P)
    bbox_p = flat["bbox"].astype(jnp.float32)     # (B, P, 4)
    kps_p = flat["kps"].astype(jnp.float32)       # (B, P, 2K)

    decoded = bbox_decode(priors, bbox_p)         # (B, P, 4)

    tgt = build_targets_batched(
        jax.lax.stop_gradient(cls_l), jax.lax.stop_gradient(obj_l),
        priors, jax.lax.stop_gradient(decoded),
        batch["gt_bboxes"], batch["gt_labels"], batch["gt_kps"],
        batch["gt_valid"],
        num_classes=cfg.model.num_classes, kps_num=cfg.model.kps_num,
        center_radius=cfg.assigner.center_radius,
        candidate_topk=cfg.assigner.candidate_topk,
        iou_weight=cfg.assigner.iou_weight,
        cls_weight=cfg.assigner.cls_weight,
        use_pallas=None if cfg.train.pallas_simota else False)
    tgt = jax.lax.stop_gradient(tgt)

    # GhostBN groups are virtual replicas: with bn_group=g on a local
    # batch B, the g-sample groups must reproduce the loss semantics of
    # B/g real devices at batch g each — the reference normalizes by the
    # mean over GPUs of per-GPU positive counts (reduce_mean at
    # yunet_head.py:493-497) and computes the kps avg_factor per GPU
    # (yunet_head.py:518-527; DDP then averages per-GPU losses). Without
    # this, a GhostBN-16 b128 run would normalize kps by the GLOBAL
    # kps-weight sum (ratio of sums != mean of per-replica ratios) and
    # floor num_pos at 1 globally instead of per replica mean.
    b_local = images.shape[0]
    g = cfg.train.bn_group
    ng = b_local // g if 0 < g < b_local else 1

    local_pos = tgt["num_pos"].sum()
    if axis_name is not None:
        # reference normalizer: mean over replicas of per-replica pos counts
        # (reduce_mean at yunet_head.py:493-497)
        num_pos = jax.lax.pmean(local_pos, axis_name) / ng
        global_pos = jax.lax.psum(local_pos, axis_name)
    else:
        num_pos = local_pos / ng
        global_pos = local_pos
    # n = (virtual replica count) * max(mean per-replica positives, 1):
    # sum-based losses below divide their LOCAL sums by it; the pmean of
    # the resulting per-shard losses equals the reference's mean over
    # replicas of per-replica normalized losses
    n = ng * jnp.maximum(num_pos, 1.0)

    fg = tgt["fg"].astype(jnp.float32)            # (B, P)
    loss_cls = (bce_with_logits(cls_l, tgt["cls"]).sum(-1) * fg).sum() / n
    loss_obj = bce_with_logits(obj_l, tgt["obj"]).sum() / n
    loss_bbox = (eiou(decoded, tgt["bbox"],
                      smooth_point=cfg.loss.eiou_smooth_point,
                      eps=cfg.loss.eiou_eps) * fg).sum() / n

    enc_kps = kps_encode(priors, tgt["kps"])      # (B, P, 2K)
    kw = tgt["kps_weight"]                        # (B, P)
    kps_num_tot = (smooth_l1(kps_p, enc_kps, cfg.loss.kps_beta)
                   * kw[..., None])
    if ng == 1:
        loss_kps = kps_num_tot.sum() / jnp.maximum(kw.sum(), 1e-6)
    else:
        # per-virtual-replica avg_factor, mean over replicas
        kn = kps_num_tot.reshape(ng, -1).sum(1)
        kd = kw.reshape(ng, -1).sum(1)
        loss_kps = (kn / jnp.maximum(kd, 1e-6)).mean()

    total = (cfg.loss.cls_weight * loss_cls
             + cfg.loss.obj_weight * loss_obj
             + cfg.loss.bbox_weight * loss_bbox
             + cfg.loss.kps_weight * loss_kps)
    metrics = {"loss": total, "loss_cls": loss_cls, "loss_obj": loss_obj,
               "loss_bbox": cfg.loss.bbox_weight * loss_bbox,
               "loss_kps": cfg.loss.kps_weight * loss_kps,
               "num_pos": global_pos}
    return total, (new_state, metrics)


def make_train_step(cfg: Config, model: YuNet, tx, *, img_size: int,
                    mesh: Optional[jax.sharding.Mesh] = None,
                    _bank_auto_keys: Optional[frozenset] = None
                    ) -> Callable[[TrainState, Dict[str, jnp.ndarray]],
                                  Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the jitted train step. With a mesh, runs SPMD over the 'dp'
    axis via shard_map (batch sharded, params/opt replicated).

    _bank_auto_keys (internal, single-device only): the full batch key
    set; jit is built with the 'bank' input layout set to AUTO so the
    compiler CHOOSES the bank operand layout instead of copying a
    default-layout bank inside the program (probe_bank_step)."""
    sizes = [(img_size // s, img_size // s) for s in cfg.model.strides]
    priors = jnp.asarray(grid_priors(sizes, cfg.model.strides,
                                     cfg.model.prior_offset))
    axis = "dp" if mesh is not None else None

    def _step(ts: TrainState, batch):
        batch = dict(batch)
        bank = batch.pop("bank", None)
        if bank is not None:
            # HBM-staged dataset: materialize the augmented images on
            # device from crop geometry (data/device_aug.py) — no image
            # pixels crossed the host->device link this step
            from ..data.device_aug import device_resample
            batch["image"] = device_resample(
                bank, batch.pop("aug_idx"), batch.pop("aug_y0"),
                batch.pop("aug_x0"), batch.pop("aug_side"),
                batch.pop("aug_flip"), out_size=img_size,
                dtype=jnp.bfloat16 if cfg.train.bf16 else jnp.float32,
                # side <= max(crop_choice) * bank short side, so this
                # bounds side/out_size even when bank_size != img_size
                max_scale=max(cfg.data.crop_choice)
                * cfg.data.bank_size / img_size)
            # the loader wires only the GT slots its shard can fill;
            # re-pad to the configured static shape here (free on device)
            need = cfg.data.max_gts - batch["gt_bboxes"].shape[1]
            if need > 0:
                for k in ("gt_bboxes", "gt_labels", "gt_kps", "gt_valid"):
                    pad = [(0, 0), (0, need)] + [(0, 0)] * (
                        batch[k].ndim - 2)
                    batch[k] = jnp.pad(batch[k], pad)
        grads, (new_state, metrics) = jax.grad(
            lambda p: loss_fn(model, cfg, p, ts.state, batch, priors,
                              axis_name=axis), has_aux=True)(ts.params)
        if axis is not None:
            grads = jax.lax.pmean(grads, axis)
            new_state = jax.lax.pmean(new_state, axis)
            metrics = jax.lax.pmean(metrics, axis)
        updates, new_opt = tx.update(grads, ts.opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates)
        ema = ts.ema_params
        if ema is not None:
            # ExpMomentumEMA warmup (reference core/hook/ema.py:103-113)
            from .ema import exp_momentum, ema_update
            m = exp_momentum(cfg.train.ema_momentum)(
                ts.step.astype(jnp.float32))
            ema = ema_update(ema, new_params, m)
        return TrainState(new_params, new_state, new_opt, ts.step + 1,
                          ema), metrics

    if mesh is None:
        if _bank_auto_keys is not None:
            from jax.experimental.layout import Format, Layout
            batch_sh = {k: (Format(Layout.AUTO) if k == "bank" else None)
                        for k in _bank_auto_keys}
            return jax.jit(_step, donate_argnums=(0,),
                           in_shardings=(None, batch_sh))
        return jax.jit(_step, donate_argnums=(0,))

    from jax.sharding import PartitionSpec as P
    replicated = P()
    batch_spec = P("dp")

    ts_spec = TrainState(
        params=replicated, state=replicated, opt_state=replicated,
        step=replicated, ema_params=replicated)
    data_spec = {"gt_bboxes": batch_spec, "gt_labels": batch_spec,
                 "gt_kps": batch_spec, "gt_valid": batch_spec}
    if cfg.data.device_aug:
        # bank: replicated (every chip holds the staged dataset) or
        # sharded over 'dp' (each chip holds + samples its own slice;
        # aug_idx is then shard-local — data/device_aug.py)
        data_spec["bank"] = (batch_spec if cfg.data.bank_sharded
                             else replicated)
        for k in ("aug_idx", "aug_y0", "aug_x0", "aug_side", "aug_flip"):
            data_spec[k] = batch_spec
    else:
        data_spec["image"] = batch_spec

    sharded = jax.shard_map(
        _step, mesh=mesh,
        in_specs=(ts_spec, data_spec),
        out_specs=(ts_spec, replicated),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,))


def probe_bank_step(cfg: Config, model: YuNet, tx, *, img_size: int,
                    ts: TrainState, batch_np: Dict[str, "jnp.ndarray"],
                    bank_shape):
    """AOT-compile the single-device train step with the bank's input
    layout chosen by the COMPILER (Layout.AUTO), so the bank can be
    staged directly in the layout the program reads.

    Without this, the step's preferred bank layout differs from the
    device_put default and XLA inserts a full-bank relayout copy inside
    the program: at real-dataset scale that copy OOMs the chip (10.39 GB
    HLO temp on a 15.75 GB v5e, round-5 XL rehearsal) and at any scale
    it taxes every step (the round-4 roofline's layout_copies line).

    Returns (compiled_step, bank_format) — the compiled executable keeps
    make_train_step's donation and output contract — or None when the
    backend/topology doesn't support the probe (multi-device, non-TPU);
    callers fall back to the plain jitted step.
    """
    if jax.default_backend() != "tpu" or jax.device_count() != 1:
        return None
    try:
        import numpy as np

        step2 = make_train_step(
            cfg, model, tx, img_size=img_size, mesh=None,
            _bank_auto_keys=frozenset(batch_np) | {"bank"})
        can = jax.dtypes.canonicalize_dtype
        abstract = {
            k: jax.ShapeDtypeStruct(np.shape(v), can(np.asarray(v).dtype))
            for k, v in batch_np.items()}
        abstract["bank"] = jax.ShapeDtypeStruct(bank_shape, np.uint8)
        compiled = step2.lower(ts, abstract).compile()
        fmt = compiled.input_formats[0][1]["bank"]
        # Rebuild the Format from plain attributes: the instance the
        # executable hands back prints identically but is NOT honored
        # by out_shardings/device_put in this backend (staging came out
        # (1,3,2,0) when this object requested (0,3,1,2), while a
        # hand-built Format with the same fields was honored — round-5
        # XL rehearsal, reproduced deterministically).
        from jax.experimental.layout import Format, Layout
        from jax.sharding import SingleDeviceSharding
        lay = fmt.layout
        fmt = Format(
            Layout(major_to_minor=tuple(lay.major_to_minor),
                   tiling=(None if lay.tiling is None
                           else tuple(tuple(t) for t in lay.tiling)),
                   sub_byte_element_size_in_bits=getattr(
                       lay, "sub_byte_element_size_in_bits", 0)),
            SingleDeviceSharding(jax.devices()[0]))
        return compiled, fmt
    except Exception as e:  # pragma: no cover - backend-dependent
        import logging
        logging.getLogger("yunet_tpu").warning(
            f"bank layout probe failed ({e!r}); staging with the "
            "default layout")
        return None
