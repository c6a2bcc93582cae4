#!/usr/bin/env python
"""Train YuNet on WIDER Face — TPU-native entry point.

Mirrors the surface of the reference tools/train.py (config selection,
--cfg-options dotted overrides, work-dir, resume/auto-resume, seed), but
launches a single SPMD program over the local device mesh instead of
torch.distributed process groups: run once per host, `jax.distributed`
handles multi-host.

Examples:
  python tools/train.py yunet_n
  python tools/train.py yunet_s --work-dir work_dirs/s --auto-resume
  python tools/train.py yunet_n --cfg-options train.lr=0.02 data.workers=8
  python tools/train.py yunet_n --smoke   # synthetic 20-step dry run
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train a YuNet face detector")
    p.add_argument("config", help="preset name (yunet_n | yunet_s) or path "
                   "to a python file defining get()")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--resume-from", default=None)
    p.add_argument("--auto-resume", action="store_true")
    p.add_argument("--load-pth", default=None,
                   help="initialize weights from a reference .pth")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--diff-seed", action="store_true",
                   help="mix jax.process_index() into the data seed "
                   "(reference --diff-seed)")
    p.add_argument("--sample-stats", action="store_true",
                   help="dump a GT-size histogram at the end "
                   "(YuNetSampleSizeStatisticsHook)")
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--single-device", action="store_true",
                   help="no mesh even with multiple devices")
    p.add_argument("--distributed", action="store_true",
                   help="call jax.distributed.initialize() (multi-host)")
    p.add_argument("--smoke", action="store_true",
                   help="20 steps on synthetic data (no dataset needed)")
    p.add_argument("--cfg-options", nargs="*", default=[],
                   help="dotted config overrides, e.g. train.lr=0.02")
    p.add_argument("--force-experimental", action="store_true",
                   help="allow measured-and-parked flag combinations "
                   "(e.g. train.fused_kernels, model.remat_stages) that "
                   "config validation otherwise rejects")
    p.add_argument("--eval-interval", type=int, default=0,
                   help="run WIDER val AP every N epochs (0 = off; the "
                   "reference EvalHook interval, configs/yunet_n.py:146)")
    p.add_argument("--eval-mode", type=int, default=2,
                   help="eval protocol mode as in tools/test_widerface.py "
                   "(0: 640x640, 1: 1650x1100, 2: origin size, >30: NxN)")
    p.add_argument("--eval-limit", type=int, default=0,
                   help="eval only the first N val images (0 = all)")
    p.add_argument("--eval-ann", default=None)
    p.add_argument("--eval-img-prefix", default=None)
    p.add_argument("--eval-gt-dir", default=None)
    p.add_argument("--eval-both-params", action="store_true",
                   help="when EMA is enabled, also evaluate the RAW "
                   "parameters each interval (raw_* metrics) — one run "
                   "yields the EMA-vs-raw A/B trajectory")
    p.add_argument("--eval-device-nms", action="store_true",
                   help="fuse whole-batch Pallas NMS into the eval sweep "
                   "and read back only packed top-k rows (fast on slow "
                   "host links; caps detections at 750/image)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.distributed:
        import jax
        # Explicit coordinates from the dist_train.sh env when present;
        # otherwise jax auto-detects (Slurm/GKE cluster plugins).
        addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
        if addr:
            jax.distributed.initialize(
                coordinator_address=addr,
                num_processes=int(os.environ.get("JAX_NUM_PROCESSES", 1)),
                process_id=int(os.environ.get("JAX_PROCESS_ID", 0)))
        else:
            jax.distributed.initialize()
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from yunet_tpu.config import (apply_overrides, get_config,
                                  validate_config)
    from yunet_tpu.train.loop import fit

    cfg = get_config(args.config)
    cfg = apply_overrides(cfg, args.cfg_options)
    cfg = validate_config(cfg, force_experimental=args.force_experimental)
    if args.seed is not None:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, seed=args.seed))
    if args.diff_seed:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(
                cfg.train, seed=cfg.train.seed + jax.process_index()))

    devices = jax.devices()
    mesh = None
    if len(devices) > 1 and not args.single_device:
        mesh = Mesh(np.array(devices), ("dp",))

    loader = None
    max_steps = args.max_steps
    if args.smoke:
        from smoke_data import SyntheticLoader  # noqa: local import
        # per-process batch: this host's shard of the global batch
        n_local = (min(jax.local_device_count(), mesh.size)
                   if mesh is not None else 1)
        loader = SyntheticLoader(cfg, batch_size=cfg.data.samples_per_device
                                 * n_local)
        max_steps = max_steps or 20

    eval_hook = None
    if args.eval_interval > 0:
        from yunet_tpu.eval import (make_wider_eval_hook,
                                    widerface_eval_mode)
        eval_hook = make_wider_eval_hook(
            cfg, mode=widerface_eval_mode(args.eval_mode),
            ann=args.eval_ann, img_prefix=args.eval_img_prefix,
            gt_dir=args.eval_gt_dir, limit=args.eval_limit, mesh=mesh,
            also_raw=args.eval_both_params,
            use_device_nms=args.eval_device_nms)

    ts = fit(cfg, work_dir=args.work_dir, resume_from=args.resume_from,
             auto_resume=args.auto_resume, load_pth=args.load_pth,
             max_steps=max_steps, mesh=mesh, loader=loader,
             eval_hook=eval_hook,
             eval_interval_epochs=args.eval_interval,
             sample_stats=args.sample_stats)
    if args.distributed and jax.process_count() > 1:
        jax.distributed.shutdown()
    return ts


if __name__ == "__main__":
    main()
