#!/usr/bin/env python
"""Interleaved A/B benchmark of the jitted train step.

The axon TPU tunnel has ~2x run-to-run contention noise, so sequential
benchmarks of two code variants are not comparable. This harness compiles
every requested variant up front and then interleaves measurement windows
(A, B, A, B, ...), reporting per-variant medians — both variants see the
same contention profile.

Variants are orthogonal flags:
  --pool rw|slices|reshape   max-pool impl: lax.reduce_window (grad =
                             select-and-scatter, the production op) vs
                             strided-slice max vs reshape-view max
  --dtype f32|uint8          host batch image dtype (uint8 casts on
                             device)
  --simota folded|v1|xla     SimOTA: folded 2-D-grid Pallas kernel
                             (default), 4-D-grid kernel, or the dense
                             XLA formulation
Pass a comma list to A/B: --pool rw,slices

Usage:
  python tools/misc/bench_train_step.py --batch 128 --windows 5
"""

import argparse
import itertools
import json
import statistics
import sys
import time
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def make_batch(rng, tb, img, g, dtype):
    import numpy as np
    import jax.numpy as jnp
    c = rng.uniform(40, img - 40, (tb, g, 2)).astype(np.float32)
    wh = rng.uniform(8, img // 5, (tb, g, 2)).astype(np.float32)
    kps = np.concatenate(
        [rng.uniform(20, img - 20, (tb, g, 5, 2)).astype(np.float32),
         np.ones((tb, g, 5, 1), np.float32)], -1)
    return {
        "image": jnp.asarray(rng.randint(0, 256, (tb, img, img, 3))
                             .astype(dtype)),
        "gt_bboxes": jnp.asarray(np.concatenate([c - wh / 2, c + wh / 2],
                                                -1)),
        "gt_labels": jnp.zeros((tb, g), jnp.int32),
        "gt_kps": jnp.asarray(kps),
        "gt_valid": jnp.asarray(np.tile(np.arange(g) < 12, (tb, 1))),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--max-gts", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--pool", default="rw")
    ap.add_argument("--dtype", default="f32")
    ap.add_argument("--simota", default="folded")
    ap.add_argument("--bn-bias", default="skip",
                    help="skip = stop_gradient on BN-covered conv biases "
                         "(production), keep = plain autodiff")
    ap.add_argument("--convdp", default="plain",
                    help="plain = factored pw+dw convs, composed = one "
                         "dense 3x3 conv per ConvDPUnit "
                         "(model.composed_dp)")
    ap.add_argument("--remat", default="none",
                    help="comma list of backbone remat plans: none, or "
                         "digit strings like 0 / 01 / 012 naming the "
                         "stages to jax.checkpoint")
    ap.add_argument("--bn-group", default="0",
                    help="comma list of GhostBN group sizes "
                         "(train.bn_group; 0 = whole-batch BN)")
    args = ap.parse_args(argv)

    import dataclasses
    import numpy as np
    import jax

    from yunet_tpu.config import yunet_n
    from yunet_tpu.models import YuNet, backbone
    from yunet_tpu.train import init_train_state, make_train_step

    pools = args.pool.split(",")
    dtypes = args.dtype.split(",")
    simotas = args.simota.split(",")
    bn_biases = args.bn_bias.split(",")
    rng = np.random.RandomState(0)
    cfg = yunet_n()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, img_size=args.img_size,
                                      max_gts=args.max_gts))

    variants = []
    pool_impls = {"rw": backbone.max_pool2x_reduce_window,
                  "slices": backbone.max_pool2x_slices,
                  "reshape": backbone.max_pool2x_reshape}
    import functools
    from yunet_tpu.ops import simota_pallas
    from yunet_tpu.models import layers
    simota_orig = simota_pallas.streamed_simota
    bn_bias_orig = layers._bn_covered_bias

    remats = args.remat.split(",")
    convdps = args.convdp.split(",")
    bn_groups = [int(x) for x in args.bn_group.split(",")]
    for pool, dt, sim, bnb, rm, cdp, bng in itertools.product(
            pools, dtypes, simotas, bn_biases, remats, convdps, bn_groups):
        stages = () if rm == "none" else tuple(int(c) for c in rm)
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, remat_stages=stages,
                                           composed_dp=(cdp == "composed")),
            train=dataclasses.replace(cfg.train, bn_group=bng))
        backbone.max_pool2x = pool_impls[pool]
        layers._bn_covered_bias = (bn_bias_orig if bnb == "skip"
                                   else lambda b, train: b)
        simota_pallas.streamed_simota = functools.partial(
            simota_orig, folded=(sim == "folded"))
        if sim == "xla":     # dense XLA SimOTA instead of the kernel
            cfg = dataclasses.replace(
                cfg, train=dataclasses.replace(cfg.train,
                                               pallas_simota=False))
        else:
            cfg = dataclasses.replace(
                cfg, train=dataclasses.replace(cfg.train,
                                               pallas_simota=True))
        model = YuNet(cfg.model)
        ts, tx = init_train_state(cfg, steps_per_epoch=1000,
                                  total_batch=args.batch)
        step = make_train_step(cfg, model, tx, img_size=args.img_size)
        np_dt = np.uint8 if dt == "uint8" else np.float32
        batch = make_batch(rng, args.batch, args.img_size, args.max_gts,
                           np_dt)
        ts, m = step(ts, batch)                       # compile
        jax.block_until_ready(m["loss"])
        variants.append({"name": f"pool={pool},dtype={dt},simota={sim},"
                                 f"bn_bias={bnb},remat={rm},convdp={cdp},"
                                 f"bn_group={bng}",
                         "step": step, "ts": ts, "batch": batch,
                         "vals": []})
        print(f"compiled {variants[-1]['name']}", file=sys.stderr)

    for w in range(args.windows):
        for v in variants:
            t0 = time.perf_counter()
            ts = v["ts"]
            for _ in range(args.iters):
                ts, m = v["step"](ts, v["batch"])
            # host readback, not block_until_ready: through the axon
            # tunnel block_until_ready returns before the device work is
            # done; only materializing a value truly synchronizes
            float(m["loss"])
            v["ts"] = ts
            dt_s = time.perf_counter() - t0
            v["vals"].append(args.iters * args.batch / dt_s)
        time.sleep(0.3)

    out = {}
    for v in variants:
        out[v["name"]] = {
            "imgs_per_s_median": round(statistics.median(v["vals"]), 1),
            "imgs_per_s_best": round(max(v["vals"]), 1),
            "windows": [round(x, 1) for x in v["vals"]],
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
