#!/usr/bin/env python
"""Profile the train step: aggregate device op times from a JAX trace.

Runs a few steps under jax.profiler.trace and prints the top device ops
by total duration (one step's worth, averaged over the traced steps).

Usage: python tools/misc/profile_train_step.py --batch 128 --steps 3
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--max-gts", type=int, default=128)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--out", default="/tmp/yunet_trace")
    ap.add_argument("--device-aug", action="store_true",
                    help="profile the production program: HBM bank + "
                    "MXU resample fused into the step")
    ap.add_argument("--ema", action="store_true",
                    help="include the EMA update (rehearsal config)")
    args = ap.parse_args(argv)

    import dataclasses
    import numpy as np
    import jax

    from yunet_tpu.config import yunet_n
    from yunet_tpu.models import YuNet
    from yunet_tpu.train import init_train_state, make_train_step
    from yunet_tpu.utils.trace_profile import (HloMaps, aggregate_trace,
                                               report)
    from bench_train_step import make_batch

    from yunet_tpu.utils.env import enable_compilation_cache
    enable_compilation_cache()

    cfg = yunet_n()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, img_size=args.img_size,
                                      max_gts=args.max_gts,
                                      device_aug=args.device_aug),
        train=dataclasses.replace(
            cfg.train, ema_momentum=0.0002 if args.ema else 0.0))
    model = YuNet(cfg.model)
    ts, tx = init_train_state(cfg, steps_per_epoch=1000,
                              total_batch=args.batch)
    step = make_train_step(cfg, model, tx, img_size=args.img_size)
    batch = make_batch(np.random.RandomState(0), args.batch, args.img_size,
                       args.max_gts, np.uint8)
    if args.device_aug:
        rng = np.random.RandomState(1)
        import jax.numpy as jnp
        batch.pop("image")
        # match DeviceAugLoader's wire-GT trim (16 slots for the synth
        # set) so the profiled program is the exact rehearsal program
        # (and hits its compilation-cache entry)
        wire = 16
        for k in ("gt_bboxes", "gt_labels", "gt_kps", "gt_valid"):
            batch[k] = batch[k][:, :wire]
        n_imgs = 64
        batch["bank"] = jax.device_put(rng.randint(
            0, 256, (n_imgs, 1152, 1152, 3)).astype(np.uint8))
        batch["aug_idx"] = jnp.asarray(
            rng.randint(0, n_imgs, (args.batch,)).astype(np.int32))
        batch["aug_y0"] = jnp.asarray(
            rng.uniform(0, 200, (args.batch,)).astype(np.float32))
        batch["aug_x0"] = jnp.asarray(
            rng.uniform(0, 200, (args.batch,)).astype(np.float32))
        batch["aug_side"] = jnp.asarray(
            rng.uniform(320, 960, (args.batch,)).astype(np.float32))
        batch["aug_flip"] = jnp.asarray(rng.rand(args.batch) < 0.5)
    ts, m = step(ts, batch)
    jax.block_until_ready(m["loss"])

    maps = HloMaps(step.lower(ts, batch).compile().as_text())

    with jax.profiler.trace(args.out):
        for _ in range(args.steps):
            ts, m = step(ts, batch)
        jax.block_until_ready(m["loss"])

    try:
        tot, cnt = aggregate_trace(args.out)
    except FileNotFoundError as e:
        print(e)
        return
    report(maps, tot, cnt, args.steps, args.top)


if __name__ == "__main__":
    main()
