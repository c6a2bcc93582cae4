"""Micro-bench: channels-major fused kernel vs XLA unfused pw+dw.

The whole chained window runs inside ONE jitted fori_loop per variant,
so there are no eager tunnel round-trips; sync is a tiny readback.
Stage2 config (64->64, 160^2, batch 128, bf16).
"""
import functools
import statistics
import time

import numpy as np
import jax
import jax.numpy as jnp

from yunet_tpu.ops.convdp_cm_pallas import fused_conv_dp_cm_impl
from yunet_tpu.models.layers import conv2d

N, H, W, CIN, COUT = 128, 160, 160, 64, 64
DT = jnp.bfloat16
ITERS = 20
rng = np.random.RandomState(0)
x_nhwc = jnp.asarray(rng.randn(N, H, W, CIN) * 0.1, DT)
x_cm = jnp.asarray(rng.randn(H, CIN, W * N) * 0.1, DT)
w1 = jnp.asarray(rng.randn(1, 1, CIN, COUT).astype(np.float32) * 0.05)
b1 = jnp.asarray(rng.randn(COUT).astype(np.float32) * 0.1)
wd = jnp.asarray(rng.randn(3, 3, 1, COUT).astype(np.float32) * 0.05)
bd = jnp.asarray(rng.randn(COUT).astype(np.float32) * 0.1)


def xla_unit(x, w1, b1, wd, bd):
    y = conv2d(x, w1, b1)
    return conv2d(y, wd, bd, padding=1, depthwise=True)


def make_chain(unit):
    @jax.jit
    def chain(x, w1, b1, wd, bd):
        def body(i, xx):
            # tanh keeps values bounded so the chain can't overflow
            return jnp.tanh(unit(xx, w1, b1, wd, bd).astype(jnp.float32)
                            ).astype(DT)
        return jax.lax.fori_loop(0, ITERS, body, x)
    return chain


variants = {"xla_nhwc": (make_chain(xla_unit), x_nhwc)}
for (r, wc) in [(2, 40), (4, 20), (8, 8), (8, 16)]:
    unit = functools.partial(fused_conv_dp_cm_impl, w=W, n=N, relu=False,
                             row_block=r, wcol_block=wc)
    variants[f"cm_r{r}_w{wc}"] = (make_chain(unit), x_cm)


def sync(out):
    np.asarray(out.reshape(-1)[:8])


compiled = {}
for name, (fn, x0) in variants.items():
    try:
        t0 = time.perf_counter()
        out = fn(x0, w1, b1, wd, bd)
        sync(out)
        print(f"compiled {name} ({time.perf_counter() - t0:.1f}s)",
              flush=True)
        compiled[name] = (fn, x0, [])
    except Exception as e:
        print("FAILED", name, type(e).__name__, str(e)[:300], flush=True)

windows = 5
for _ in range(windows):
    for name, (fn, x0, vals) in compiled.items():
        t0 = time.perf_counter()
        out = fn(x0, w1, b1, wd, bd)
        sync(out)
        vals.append((time.perf_counter() - t0) / ITERS * 1e3)
    time.sleep(0.2)

bytes_min = (H * W * N * (CIN + COUT) * 2)  # read x + write z, bf16
for name, (fn, x0, vals) in compiled.items():
    ms = statistics.median(vals)
    print(f"{name:12s} {ms:7.3f} ms/unit   eff {bytes_min / ms / 1e6:6.1f}"
          f" GB/s  windows={[round(v, 3) for v in vals]}", flush=True)
