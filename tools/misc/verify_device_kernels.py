#!/usr/bin/env python
"""Drive the Pallas kernels on the REAL device and differential-check
them against host/lax references — the on-hardware complement to the
CPU interpret-mode tests (which cannot catch Mosaic lowering issues,
e.g. the SMEM-scalar dynamic loop bound added to the NMS kernels).

  python tools/misc/verify_device_kernels.py          # all checks
  python tools/misc/verify_device_kernels.py --quick  # skip SimOTA

Prints PASS/FAIL per check; exit code 0 iff all pass.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def _boxes(rng, n):
    import numpy as np
    xy = rng.uniform(0, 900, (n, 2)).astype(np.float32)
    wh = rng.uniform(8, 120, (n, 2)).astype(np.float32)
    return np.concatenate([xy, xy + wh], 1)


def check_nms(quick=False):
    """pallas_nms / pallas_nms_batched / device_nms keep sets must agree
    on device, including the sparse-score regime that exercises the
    dynamic trip count (0 / 1 / few / many candidates per image)."""
    import numpy as np
    import jax.numpy as jnp
    from yunet_tpu.ops.nms import device_nms
    from yunet_tpu.ops.nms_pallas import pallas_nms, pallas_nms_batched

    rng = np.random.RandomState(77)
    shapes = ((4, 400, 256), (2, 900, 750)) if not quick else ((4, 400, 256),)
    for bsz, n, top_k in shapes:
        boxes = np.stack([_boxes(rng, n) for _ in range(bsz)])
        scores = rng.uniform(0, 0.003, (bsz, n)).astype(np.float32)
        counts = [0, 1, 12, min(60, n)][:bsz]
        for b, cnt in enumerate(counts):
            scores[b, rng.choice(n, cnt, replace=False)] = rng.uniform(
                0.1, 1.0, cnt)
        t0 = time.perf_counter()
        db, kb, ib = pallas_nms_batched(
            jnp.asarray(boxes), jnp.asarray(scores), top_k=top_k,
            iou_thr=0.45, score_thr=0.02)
        kb_h = np.asarray(kb)
        dt = time.perf_counter() - t0
        for b in range(bsz):
            _, k1, i1 = pallas_nms(
                jnp.asarray(boxes[b]), jnp.asarray(scores[b]),
                top_k=top_k, iou_thr=0.45, score_thr=0.02)
            _, k0, i0 = device_nms(
                jnp.asarray(boxes[b]), jnp.asarray(scores[b]),
                top_k=top_k, iou_thr=0.45, score_thr=0.02)
            np.testing.assert_array_equal(kb_h[b], np.asarray(k1))
            np.testing.assert_array_equal(np.asarray(k1), np.asarray(k0))
            np.testing.assert_array_equal(np.asarray(ib)[b],
                                          np.asarray(i1))
        print(f"  nms b{bsz}/n{n}/k{top_k}: keep sets identical "
              f"(batched kernel compile+run {dt:.2f}s)")


def check_simota():
    """Streaming Pallas SimOTA vs the dense XLA assignment on device
    (same construction as tests/test_assign.py:186, real train shape)."""
    import numpy as np
    import jax.numpy as jnp
    from yunet_tpu.ops.assign import sim_ota_assign_batched

    rng = np.random.RandomState(7)
    b, p, g = 4, 8400, 32
    pri = np.stack([rng.uniform(0, 640, p), rng.uniform(0, 640, p),
                    np.full(p, 8.0), np.full(p, 8.0)], -1).astype(
        np.float32)
    scores = rng.uniform(1e-4, 1, (b, p, 1)).astype(np.float32)
    c = rng.uniform(20, 600, (b, p, 2))
    wh = rng.uniform(4, 80, (b, p, 2))
    dec = np.concatenate([c - wh / 2, c + wh / 2], -1).astype(np.float32)
    gc = rng.uniform(20, 600, (b, g, 2))
    gwh = rng.uniform(8, 100, (b, g, 2))
    gtb = np.concatenate([gc - gwh / 2, gc + gwh / 2], -1).astype(
        np.float32)
    args = (jnp.asarray(scores), jnp.asarray(pri), jnp.asarray(dec),
            jnp.asarray(gtb), jnp.asarray(np.zeros((b, g), np.int32)),
            jnp.asarray(rng.uniform(size=(b, g)) < 0.7))
    r_x = sim_ota_assign_batched(*args, use_pallas=False)
    r_p = sim_ota_assign_batched(*args, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(r_x.fg_mask),
                                  np.asarray(r_p.fg_mask))
    np.testing.assert_array_equal(np.asarray(r_x.matched_gt),
                                  np.asarray(r_p.matched_gt))
    print("  simota: streamed kernel == dense assignment "
          f"(b{b}, P={p}, G={g})")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--quick", action="store_true")
    args = p.parse_args(argv)

    import jax
    plat = jax.devices()[0].platform
    print(f"platform: {plat}" + (
        "" if plat == "tpu" else "  (WARNING: not a TPU — the Pallas "
        "kernels will run in interpret mode; this script is meant for "
        "the real device)"))

    failures = 0
    for name, fn in (("nms", lambda: check_nms(args.quick)),
                     ("simota", check_simota)):
        if args.quick and name == "simota":
            continue
        try:
            fn()
            print(f"PASS {name}")
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"FAIL {name}: {type(e).__name__}: {e}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
