#!/usr/bin/env python
"""Benchmark: detect + train throughput for YuNet-n on one TPU chip.

Baseline: the reference README's headline inference number — 456 FPS for
YuNet-n at 320x320 through ONNXRuntime on an i7-12700K CPU
(README.md:140-147, harness tools/compare_inference.py). Both measured
paths do the same work per image: full forward + score fusion + decode +
NMS.

Prints ONE JSON line. The HEADLINE value is the MEDIAN batched-serving
throughput (batch 16, BN-folded trunk + vmapped on-device Pallas NMS in
one compiled program) — batching is how a TPU serves, and the number is
stable under tunnel contention. The "extra" field carries the rest of the
perf story: batch-1 pipelined-dispatch FPS (median/best — swings ~2x with
tunnel load since every call pays a host round-trip),
train-step throughput at 640^2 (batch 16/64/128; 128 saturates
the lane dimension of XLA's batch-minor conv layouts), and a roofline note
(achieved TFLOP/s and MFU — YuNet is a 75k-param depthwise net, so it is
HBM-bandwidth-bound, not MXU-bound; MFU is reported for scale, not as the
optimization target).

Env: YUNET_BENCH_FAST=1 skips the train-step section (detect only).
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FPS = 456.0  # reference README.md:146 (i7-12700K, ORT, 320x320)
REF_PTH = "/root/reference/weights/yunet_n.pth"
V5E_PEAK_BF16_TFLOPS = 197.0


def _sync(out):
    """True device sync: materialize one output leaf on the host.

    jax.block_until_ready does NOT wait for queued device work through
    the axon tunnel (measured: 30 chained 1ms convolutions "complete" in
    0.7ms wall); only a host readback drains the execution queue.
    """
    import jax
    import numpy as np
    leaves = jax.tree.leaves(out)
    np.asarray(min(leaves, key=lambda a: a.size))


def _measure_windows(dispatch, iters, windows, gap=0.5):
    """N async dispatches + one final readback barrier per window;
    returns img/s per window (tunnel contention makes single windows
    noisy)."""
    vals = []
    for _ in range(windows):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = dispatch()
        _sync(out)
        vals.append(iters / (time.perf_counter() - t0))
        time.sleep(gap)
    return vals


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yunet_tpu.config import yunet_n
    from yunet_tpu.eval.detect import Detector
    from yunet_tpu.models import YuNet

    fast = bool(os.environ.get("YUNET_BENCH_FAST"))
    cfg = yunet_n()
    model = YuNet(cfg.model)
    if os.path.exists(REF_PTH):
        from yunet_tpu.utils import load_pth_params
        params, state = load_pth_params(REF_PTH)
    else:
        params, state = model.init(jax.random.PRNGKey(0))

    extra = {}
    rng = np.random.RandomState(0)

    # ---- batch-1 detect @320^2 (the baseline-comparable number) ----------
    # fused=True: BN-folded trunk with the Pallas pw->dw->relu kernel
    det = Detector(cfg, params, state, bf16=True, fused=True)
    fn = det._nms_fn(320, 320, 512)
    p_d, s_d = det.params, det.state
    # several distinct inputs, round-robined: guards against any
    # result-caching of repeated identical executions in the tunnel
    xs1 = [jnp.asarray(rng.randint(0, 256, (1, 320, 320, 3))
                       .astype(np.float32)) for _ in range(4)]
    _sync(fn(p_d, s_d, xs1[0]))                      # compile
    for _ in range(50):                              # pipeline warmup
        out = fn(p_d, s_d, xs1[0])
    _sync(out)
    it1 = iter(range(10 ** 9))
    w1 = _measure_windows(
        lambda: fn(p_d, s_d, xs1[next(it1) % 4]), iters=300, windows=8)
    extra["detect_b1_imgs_per_s"] = round(statistics.median(w1), 1)
    extra["detect_b1_windows_imgs_per_s"] = [round(v, 1) for v in w1]
    extra["detect_b1_best_imgs_per_s"] = round(max(w1), 1)
    extra["detect_b1_vs_baseline"] = round(
        statistics.median(w1) / BASELINE_FPS, 3)

    # ---- batched serving @320^2, batch 16: BN-folded trunk through
    # XLA's conv emitters (use_pallas=False: at batch>=16 XLA's
    # batch-minor layouts fill the lanes and depthwise runs on the MXU —
    # 1.9x the Pallas stencil trunk, which wins only at batch 1) +
    # vmapped on-device NMS, all in ONE compiled program.
    from yunet_tpu.models.fused import fused_forward
    from yunet_tpu.models.head import flatten_level_outputs
    from yunet_tpu.ops.nms_pallas import pallas_nms
    from yunet_tpu.ops.boxes import bbox_decode, kps_decode
    from yunet_tpu.ops.priors import grid_priors
    b = 16
    sizes = model.featmap_sizes(320, 320)
    priors = jnp.asarray(grid_priors(sizes, cfg.model.strides,
                                     cfg.model.prior_offset))
    folded = det._folded

    @jax.jit
    def serve_batch(x):
        outs = fused_forward(folded, x.astype(jnp.bfloat16), cfg.model,
                             use_pallas=False)
        flat = flatten_level_outputs(outs)
        cls = flat["cls"].astype(jnp.float32)
        obj = flat["obj"][..., 0].astype(jnp.float32)
        scores = jax.nn.sigmoid(cls[..., 0]) * jax.nn.sigmoid(obj)
        boxes = bbox_decode(priors, flat["bbox"].astype(jnp.float32))
        kps = kps_decode(priors, flat["kps"].astype(jnp.float32))

        def one(bx, sc, kp):
            dets, keep, idx = pallas_nms(
                bx, sc, top_k=512, iou_thr=cfg.test.nms_iou_thr,
                score_thr=cfg.test.score_thr)
            return dets, keep, kp[idx]
        return jax.vmap(one)(boxes, scores, kps)

    def serve_windows(batch_size, iters, warmup=8, n_inputs=4):
        """Measure serve_batch at a batch size (jit re-traces per
        leading dim); distinct round-robined inputs, readback sync."""
        xs = [jnp.asarray(rng.randint(0, 256, (batch_size, 320, 320, 3))
                          .astype(np.uint8)) for _ in range(n_inputs)]
        _sync(serve_batch(xs[0]))
        for i in range(warmup):
            o = serve_batch(xs[i % n_inputs])
        _sync(o)
        it = iter(range(10 ** 9))
        w = _measure_windows(
            lambda: serve_batch(xs[next(it) % n_inputs]),
            iters=iters, windows=5)
        return [v * batch_size for v in w]

    wb = serve_windows(b, iters=60)
    fps_typ = statistics.median(wb)          # the headline
    extra["detect_b16_best_imgs_per_s"] = round(max(wb), 1)

    # peak offline throughput: same program at batch 128
    wbb = serve_windows(128, iters=25)
    extra["detect_b128_imgs_per_s"] = round(statistics.median(wbb), 1)
    extra["detect_b128_vs_baseline"] = round(
        statistics.median(wbb) / BASELINE_FPS, 3)

    # ---- train step @640^2 (batch 16 / 64 / 128) -------------------------------
    if not fast:
        import dataclasses
        from yunet_tpu.train import init_train_state, make_train_step
        from yunet_tpu.utils.flops import count_macs

        for tb in (16, 64, 128):
            tcfg = dataclasses.replace(
                cfg, data=dataclasses.replace(cfg.data, img_size=640,
                                              max_gts=128))
            ts, tx = init_train_state(tcfg, steps_per_epoch=1000,
                                      total_batch=tb)
            step = make_train_step(tcfg, model, tx, img_size=640)
            g = tcfg.data.max_gts
            c = rng.uniform(40, 600, (tb, g, 2)).astype(np.float32)
            wh = rng.uniform(8, 120, (tb, g, 2)).astype(np.float32)
            kps = np.concatenate(
                [rng.uniform(20, 620, (tb, g, 5, 2)).astype(np.float32),
                 np.ones((tb, g, 5, 1), np.float32)], -1)
            # uint8 images: the loader's device-feed contract (cast to
            # bf16 on device; 4x less host->device traffic)
            batch = {
                "image": jnp.asarray(rng.randint(
                    0, 256, (tb, 640, 640, 3)).astype(np.uint8)),
                "gt_bboxes": jnp.asarray(
                    np.concatenate([c - wh / 2, c + wh / 2], -1)),
                "gt_labels": jnp.zeros((tb, g), jnp.int32),
                "gt_kps": jnp.asarray(kps),
                "gt_valid": jnp.asarray(
                    np.tile(np.arange(g) < 12, (tb, 1))),
            }
            ts, m = step(ts, batch)                  # compile
            float(m["loss"])
            n_meas = 10
            vals = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(n_meas):
                    ts, m = step(ts, batch)
                float(m["loss"])                     # true sync
                vals.append(n_meas / (time.perf_counter() - t0))
                time.sleep(0.3)
            sps = statistics.median(vals)
            extra[f"train_640_b{tb}_imgs_per_s"] = round(sps * tb, 1)
            if tb == 128:
                # fwd + bwd ~= 3x fwd MACs; 2 FLOPs per MAC
                macs = count_macs(cfg.model, (640, 640))
                tflops = sps * tb * macs * 3 * 2 / 1e12
                extra["train_b128_achieved_tflops"] = round(tflops, 3)
                extra["train_b128_mfu_pct"] = round(
                    100 * tflops / V5E_PEAK_BF16_TFLOPS, 3)
                extra["roofline_note"] = (
                    "75k-param depthwise net: HBM-bandwidth-bound on a "
                    "v5e (197 bf16 TFLOP/s peak); low MFU is structural, "
                    "throughput is the target metric")

    print(json.dumps({
        "metric": "serve_fps_320x320_b16_yunet_n",
        "value": round(fps_typ, 2),
        "unit": "img/s",
        "vs_baseline": round(fps_typ / BASELINE_FPS, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
