"""Trainable fused pointwise->depthwise kernel with custom VJP.

The train step is HBM-bandwidth-bound: for every ConvDPUnit, XLA
materializes the pointwise output y1 = pw(x) in HBM, reads it back for the
depthwise conv, and stores it again as a residual for the backward pass
(plus the transposed convs re-read it). This op removes y1 from HBM
entirely:

  forward:  z = dw(pw(x))   — one kernel, y1 lives in VMEM per row-band
                              (reuses the inference kernel, relu/bn off)
  backward: recompute y1 band-by-band from x (recompute-in-kernel remat),
            and produce dx plus all four parameter grads in one kernel:
              dy1 = corr(dz, rot180(wd))      (9-tap stencil, VPU)
              dx  = dy1 @ w1^T                 (MXU)
              dw1 += x_band^T @ dy1            (MXU, grid-accumulated)
              db1 += sum(dy1)
              dwd[k] += sum(y1_shift_k * dz)   (grid-accumulated)
              dbd += sum(dz)

BatchNorm/ReLU stay outside (they need the global batch statistics and are
cheap elementwise work XLA fuses into neighbors).

Numerics: internal f32 accumulation regardless of input dtype (slightly
more precise than the unfused bf16 composition).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .convdp_pallas import fused_conv_dp, pad_for_bands
from .convdp_pallas_impl import bwd_kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_pw_dw(x, w1, b1, wd, bd, row_block: int = 40):
    """z = depthwise3x3(pointwise(x, w1, b1), wd, bd); differentiable."""
    return fused_conv_dp(x, w1, b1, wd, bd, relu=False,
                         row_block=row_block)


def _fwd(x, w1, b1, wd, bd, row_block):
    z = fused_conv_dp(x, w1, b1, wd, bd, relu=False, row_block=row_block)
    return z, (x, w1, b1, wd, bd)


def _bwd(row_block, res, dz):
    x, w1, b1, wd, bd = res
    n, h, w, cin = x.shape
    w1m = w1.reshape(-1, w1.shape[-1]).astype(jnp.float32)
    cout = w1m.shape[-1]
    wdm = wd.reshape(9, cout).astype(jnp.float32)
    rows = min(row_block, h)
    n_blocks = -(-h // rows)
    xp = pad_for_bands(x, rows, n_blocks, h)
    dzp = pad_for_bands(dz, rows, n_blocks, h)

    out_shapes = (
        jax.ShapeDtypeStruct((n, n_blocks * rows, w, cin), x.dtype),  # dx
        jax.ShapeDtypeStruct((cin, cout), jnp.float32),        # dw1
        jax.ShapeDtypeStruct((1, cout), jnp.float32),          # db1
        jax.ShapeDtypeStruct((9, cout), jnp.float32),          # dwd
        jax.ShapeDtypeStruct((1, cout), jnp.float32),          # dbd
    )
    x_band = lambda off: pl.BlockSpec(  # noqa: E731
        (1, rows, w + 2, cin), lambda i, j: (i, j + off, 0, 0),
        memory_space=pltpu.VMEM)
    dz_band = lambda off: pl.BlockSpec(  # noqa: E731
        (1, rows, w + 2, cout), lambda i, j: (i, j + off, 0, 0),
        memory_space=pltpu.VMEM)
    acc_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, j: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    dx, dw1, db1, dwd, dbd = pl.pallas_call(
        functools.partial(bwd_kernel, rows, h, w, cin, cout),
        out_shape=out_shapes,
        grid=(n, n_blocks),
        in_specs=[
            x_band(0), x_band(1),
            dz_band(0), dz_band(1),
            acc_spec((cin, cout)),
            acc_spec((1, cout)),
            acc_spec((9, cout)),
        ],
        out_specs=(
            pl.BlockSpec((1, rows, w, cin), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            acc_spec((cin, cout)),
            acc_spec((1, cout)),
            acc_spec((9, cout)),
            acc_spec((1, cout)),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(xp, xp, dzp, dzp, w1m,
      b1.reshape(1, cout).astype(jnp.float32), wdm)

    dx = dx[:, :h]
    dw1 = dw1.reshape(w1.shape).astype(w1.dtype)
    db1 = db1.reshape(b1.shape).astype(b1.dtype)
    dwd = dwd.reshape(wd.shape).astype(wd.dtype)
    dbd = dbd.reshape(bd.shape).astype(bd.dtype)
    return dx, dw1, db1, dwd, dbd


fused_pw_dw.defvjp(_fwd, _bwd)


# FINDINGS (v5e, round 1): this trainable fused path is numerically exact
# (gradcheck to 1e-7 vs the XLA composition) but ~3x SLOWER than XLA's conv
# emitters in the full train step (125ms vs 44ms at 640²/batch16). Causes:
# (a) sub-32-channel tensors are lane-padded to 128 in VMEM, forcing narrow
#     row bands to fit the Mosaic stack (every shifted tap slice counts as
#     a live buffer);
# (b) the 9-tap stencil via shifted slices lowers to expensive vector
#     relayouts, where XLA's EmitDepthwise* emitters use tuned schedules.
# It stays available behind cfg.train.fused_kernels=False as a correct
# reference implementation; a faster approach would keep channels in
# sublanes (channels-first layout) for the low-channel stages.
