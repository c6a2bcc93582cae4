#!/usr/bin/env python
"""Profile the batched serving program (the bench.py headline path).

Builds the exact `bench.py:_serve_fn` program — folded-BN trunk +
decode + whole-batch Pallas NMS in one compiled program at 320² — traces a
few dispatches, and prints the per-category / per-op device table so
the serving roofline is measured, not asserted (the train step got this
treatment in round 3; this is the serving side).

Usage: python tools/misc/profile_serve.py --batch 16 --iters 20
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20,
                    help="dispatches inside the trace")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--config", default="yunet_n",
                    choices=["yunet_n", "yunet_s"])
    ap.add_argument("--out", default="/tmp/yunet_serve_trace")
    ap.add_argument("--stem-s2d", action="store_true",
                    help="trace the space-to-depth stem variant")
    ap.add_argument("--ab-composed", action="store_true",
                    help="interleaved A/B: factored pw->dw vs composed "
                         "dense-3x3 serving trunk (models/fused.py "
                         "_unit composed=True)")
    ap.add_argument("--ab-stem", action="store_true",
                    help="interleaved wall-clock A/B: plain stem vs "
                    "space-to-depth stem (both compiled up front; "
                    "windows alternate to cancel tunnel drift)")
    args = ap.parse_args(argv)
    if args.ab_stem and args.ab_composed:
        ap.error("--ab-stem and --ab-composed are separate A/B sessions; "
                 "pass one at a time")

    import numpy as np
    import jax
    import jax.numpy as jnp

    import bench
    from yunet_tpu import config as cfg_mod
    from yunet_tpu.eval import Detector
    from yunet_tpu.utils.env import enable_compilation_cache
    from yunet_tpu.utils.trace_profile import (HloMaps, aggregate_trace,
                                               report)

    enable_compilation_cache()
    cfg = getattr(cfg_mod, args.config)()
    model, params, state = bench._load(
        cfg, bench.REF_PTH if args.config == "yunet_n" else bench.REF_PTH_S)
    det = Detector(cfg, params, state, bf16=True, fused=True)
    serve = bench._serve_fn(cfg, model, det, stem_s2d=args.stem_s2d)

    rng = np.random.RandomState(0)
    xs = [jnp.asarray(rng.randint(0, 256, (args.batch, 320, 320, 3))
                      .astype(np.uint8)) for _ in range(4)]

    if args.ab_stem or args.ab_composed:
        import statistics
        import time
        if args.ab_composed:
            names = ("factored", "composed")
            serve_b = bench._serve_fn(cfg, model, det, composed=True)
        else:
            names = ("plain", "s2d")
            serve_b = bench._serve_fn(cfg, model, det, stem_s2d=True)
        bench._sync(serve(xs[0]))
        bench._sync(serve_b(xs[0]))
        wins = {names[0]: [], names[1]: []}
        for w in range(10):
            for name, fn in ((names[0], serve), (names[1], serve_b)):
                t0 = time.perf_counter()
                out = None
                for i in range(args.iters):
                    out = fn(xs[i % 4])
                bench._sync(out)
                dt = time.perf_counter() - t0
                wins[name].append(args.batch * args.iters / dt)
        for name, v in wins.items():
            print(f"{name:<9}: median {statistics.median(v):8.1f} "
                  f"img/s  (min {min(v):.1f}, max {max(v):.1f})")
        return
    bench._sync(serve(xs[0]))
    maps = HloMaps(serve.lower(xs[0]).compile().as_text())

    with jax.profiler.trace(args.out):
        out = None
        for i in range(args.iters):
            out = serve(xs[i % 4])
        bench._sync(out)

    try:
        tot, cnt = aggregate_trace(args.out)
    except FileNotFoundError as e:
        print(e)
        return
    report(maps, tot, cnt, args.iters, args.top)
    total_us = sum(tot.values())
    ms = total_us / args.iters / 1e3
    print(f"\ndevice-time throughput bound: "
          f"{args.batch / (ms / 1e3):.0f} img/s at batch {args.batch} "
          f"(wall-clock bench adds dispatch/tunnel overhead)")


if __name__ == "__main__":
    main()
