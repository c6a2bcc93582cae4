"""Training runtime: an explicit loop replacing the mmcv EpochBasedRunner +
hook registry (reference apis/train.py:117-244).

Responsibilities mapped from the reference hooks:
  - LrUpdater / OptimizerHook  -> fused into the jitted train step
  - CheckpointHook (interval epochs) + latest pointer / auto-resume
  - TextLogger/TensorboardLogger every N iters (+ images/sec/chip meter)
  - CheckInvalidLossHook       -> finite-loss guard
  - DistSamplerSeedHook        -> epoch-seeded shuffling in TrainLoader
  - SyncNormHook               -> BN running stats pmean'd inside the step
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import numpy as np

from ..config import Config
from ..data.dataset import SampleSpec
from ..data.loader import TrainLoader, device_prefetch
from ..models.detector import YuNet
from ..utils.logging import MetricsLogger, get_logger
from .checkpoint import find_latest_checkpoint, load_checkpoint, \
    save_checkpoint
from .step import init_train_state, make_train_step


def fit(cfg: Config, *, work_dir: Optional[str] = None,
        resume_from: Optional[str] = None, auto_resume: bool = False,
        load_pth: Optional[str] = None, max_steps: Optional[int] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
        loader: Optional[TrainLoader] = None,
        eval_hook=None, eval_interval_epochs: int = 0,
        sample_stats: bool = False):
    """Run training. Returns the final TrainState.

    eval_hook: optional callable (train_state, step) -> dict of metrics,
    fired every eval_interval_epochs (the EvalHook counterpart,
    reference core/evaluation/eval_hooks.py:24-130).
    """
    work_dir = work_dir or cfg.work_dir
    logger = get_logger(f"{work_dir}/train.log")
    metrics_log = MetricsLogger(work_dir)
    from ..utils.env import env_string, setup_multi_processes
    setup_multi_processes()
    logger.info("environment:\n" + env_string())
    n_dev = mesh.size if mesh is not None else 1   # global device count
    # per-process device count: the loader must produce only this host's
    # shard of the global batch (reference DistributedGroupSampler role)
    n_local = (min(jax.local_device_count(), n_dev)
               if mesh is not None else 1)

    if resume_from is None and auto_resume:
        resume_from = find_latest_checkpoint(work_dir)
    resume_step = 0
    if resume_from:
        import json
        import os
        meta_path = os.path.join(resume_from, "meta.json")
        if os.path.exists(meta_path):
            resume_step = json.load(open(meta_path)).get("step", 0)

    if loader is None:
        spec = SampleSpec(img_size=cfg.data.img_size,
                          max_gts=cfg.data.max_gts,
                          crop_choice=cfg.data.crop_choice,
                          flip_ratio=cfg.data.flip_ratio)
        if cfg.data.device_aug:
            from ..data.device_aug import DeviceAugLoader
            if jax.process_count() > 1 and not cfg.data.bank_sharded:
                raise ValueError(
                    "multi-process device_aug requires "
                    "data.bank_sharded=true: each host stages only its "
                    "own record shard, so a replicated bank would hold "
                    "different images per host (undefined SPMD inputs)")
            loader = DeviceAugLoader(
                cfg.data.train_ann, cfg.data.train_img_prefix,
                batch_size=cfg.data.samples_per_device * n_local,
                spec=spec, seed=cfg.train.seed,
                min_size=cfg.data.min_size,
                process_index=jax.process_index(),
                process_count=jax.process_count(),
                start_step=resume_step,
                bank_size=cfg.data.bank_size,
                bank_canvas=cfg.data.bank_canvas,
                device_shards=(n_local if cfg.data.bank_sharded else 1))
        else:
            loader = TrainLoader(
                cfg.data.train_ann, cfg.data.train_img_prefix,
                batch_size=cfg.data.samples_per_device * n_local,
                spec=spec, num_workers=cfg.data.workers,
                seed=cfg.train.seed,
                min_size=cfg.data.min_size,
                process_index=jax.process_index(),
                process_count=jax.process_count(), start_step=resume_step,
                decoded_cache=cfg.data.decoded_cache,
                reduced_decode=cfg.data.reduced_decode)
    steps_per_epoch = loader.steps_per_epoch
    # n_dev is already the GLOBAL device count (mesh spans all processes)
    total_batch = cfg.data.samples_per_device * n_dev

    init_params = init_state = None
    if load_pth:
        from ..utils.torch_import import load_pth_params
        init_params, init_state = load_pth_params(
            load_pth, shared_stacked_convs=cfg.model.shared_stacked_convs)
        logger.info(f"initialized weights from {load_pth}")

    ts, tx = init_train_state(cfg, steps_per_epoch=steps_per_epoch,
                              total_batch=total_batch,
                              params=init_params, state=init_state)
    if resume_from:
        ts, meta = load_checkpoint(resume_from, ts)
        logger.info(f"resumed from {resume_from} at step {int(ts.step)}")

    model = YuNet(cfg.model)
    step_fn = make_train_step(cfg, model, tx, img_size=cfg.data.img_size,
                              mesh=mesh)
    total_steps = (max_steps if max_steps is not None
                   else cfg.train.max_epochs * steps_per_epoch)
    logger.info(
        f"training {cfg.model.name}: {steps_per_epoch} steps/epoch, "
        f"{total_steps} total steps, global batch {total_batch}, "
        f"{n_dev} devices")

    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        sharding = NamedSharding(mesh, P("dp"))

    stats = None
    if sample_stats:
        from .hooks import SampleSizeStatistics
        stats = SampleSizeStatistics()

    bank_dev = None
    loader_it = iter(loader)
    if hasattr(loader, "bank"):
        # HBM-staged dataset: one-time device transfer, then injected
        # into every batch (the step resamples crops on device)
        repl = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            repl = NamedSharding(
                mesh, P("dp") if cfg.data.bank_sharded else P())
        bank_fmt = None
        if mesh is None:
            # single-device: compile the step with the bank operand
            # layout chosen by XLA and stage straight into it — avoids a
            # full-bank relayout copy inside the step (OOM at XL scale,
            # a per-step tax at any scale; train/step.py probe_bank_step)
            import itertools

            from .step import probe_bank_step
            first = next(loader_it)
            loader_it = itertools.chain([first], loader_it)
            probe = probe_bank_step(
                cfg, model, tx, img_size=cfg.data.img_size, ts=ts,
                batch_np={k: v for k, v in first.items()
                          if k != "num_overflow"},
                bank_shape=loader.bank.images.shape)
            if probe is not None:
                step_fn, bank_fmt = probe
                logger.info(
                    "bank layout probe: step compiled with bank "
                    f"layout {bank_fmt.layout.major_to_minor} "
                    "(major->minor); staging in that layout")
        t_stage = time.time()
        bank_dev = loader.bank.to_device(repl, fmt=bank_fmt)
        jax.block_until_ready(bank_dev)
        logger.info(
            f"staged {len(loader.bank)} images "
            f"({bank_dev.nbytes / 1e9:.2f} GB) into device HBM "
            f"in {time.time() - t_stage:.1f}s")

    if jax.process_count() > 1:
        # Align processes before the first (compile-heavy) step: startup
        # skew larger than the collective-rendezvous deadline would make
        # the fast process's first cross-host collective time out while
        # the slow one is still compiling. The barrier also establishes
        # the cross-host collective context cheaply up front.
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("fit_start")

    it = device_prefetch(loader_it, sharding=sharding)
    t_last = time.time()
    imgs_since = 0
    start_step = int(ts.step)
    step_exec = step_fn
    for i in range(start_step, total_steps):
        batch = next(it)
        batch.pop("num_overflow", None)
        if bank_dev is not None:
            batch["bank"] = bank_dev
        if stats is not None:
            stats.update(jax.device_get(
                {k: batch[k] for k in ("gt_bboxes", "gt_valid")}))
        if i == start_step and jax.process_count() > 1:
            # AOT-compile, THEN barrier, THEN dispatch: the first
            # cross-host collective's rendezvous has a fixed deadline,
            # and per-process compile times can diverge past it — align
            # processes between compile and first execution.
            from jax.experimental import multihost_utils
            step_exec = step_fn.lower(ts, batch).compile()
            multihost_utils.sync_global_devices("step_compiled")
        ts, m = step_exec(ts, batch)
        imgs_since += total_batch
        step = i + 1
        if step % cfg.train.log_interval == 0 or step == total_steps:
            from .checkpoint import to_host
            # pack the metric scalars into ONE array before fetching:
            # per-leaf readbacks each pay a host<->device round trip
            keys = sorted(m)
            try:
                import jax.numpy as jnp
                packed = to_host(jnp.stack(
                    [m[k].astype(jnp.float32) for k in keys]))
                m = dict(zip(keys, packed))
            except TypeError:   # non-scalar metrics: fetch per leaf
                m = jax.tree.map(to_host, m)
            loss = float(m["loss"])
            if not np.isfinite(loss):
                raise FloatingPointError(
                    f"non-finite loss {loss} at step {step}")
            dt = time.time() - t_last
            ips = imgs_since / max(dt, 1e-9)
            epoch = step // steps_per_epoch
            logger.info(
                f"epoch {epoch} step {step}/{total_steps} "
                f"loss {loss:.4f} (cls {float(m['loss_cls']):.4f} "
                f"bbox {float(m['loss_bbox']):.4f} "
                f"obj {float(m['loss_obj']):.4f} "
                f"kps {float(m['loss_kps']):.4f}) "
                f"num_pos {float(m['num_pos']):.0f} "
                f"imgs/s {ips:.1f} ({ips / max(n_dev, 1):.1f}/chip)")
            metrics_log.log(step, {**{k: float(v) for k, v in m.items()},
                                   "imgs_per_sec": ips}, prefix="train")
            t_last = time.time()
            imgs_since = 0
        if (step % (cfg.train.checkpoint_interval * steps_per_epoch) == 0
                or step == total_steps):
            # ALL processes must call save (orbax synchronizes internally
            # via a cross-process barrier); data/meta writes land once.
            path = save_checkpoint(
                work_dir, ts, epoch=step // steps_per_epoch,
                meta={"config": cfg.model.name})
            if jax.process_index() == 0:
                logger.info(f"saved checkpoint {path}")
        if (eval_hook is not None and eval_interval_epochs > 0
                and (step % (eval_interval_epochs * steps_per_epoch) == 0
                     or step == total_steps)):
            # also fire on the final step — the reference EvalHook always
            # evaluates at the end of training (eval_hooks.py:24-130)
            ev = eval_hook(ts, step)
            if ev is not None:   # non-zero processes skip the sweep
                logger.info(f"eval @ step {step}: {ev}")
                metrics_log.log(step, ev, prefix="val")
    if stats is not None and jax.process_index() == 0:
        stats.dump(f"{work_dir}/sample_size_stats.json")
    loader.close()
    metrics_log.close()
    if jax.process_count() > 1:
        # don't let a fast process tear down the coordinator while another
        # is still checkpointing/logging
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("fit_end")
    return ts
