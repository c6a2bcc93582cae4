"""Fused ConvDPUnit (1x1 pointwise -> 3x3 depthwise -> ReLU) Pallas kernel.

The inference trunk is entirely ConvDPUnits at low channel counts, so XLA's
per-op execution pays an HBM round-trip for the pointwise result before the
depthwise stencil reads it back. This kernel keeps the pointwise output in
VMEM: per grid step it slices a row-band of the (VMEM-resident) input with
a 1-row halo, does the (rows*W, Cin) x (Cin, Cout) matmul on the MXU,
applies the 9-tap depthwise stencil + bias + optional ReLU on the VPU, and
writes only the final band.

Intended for the *inference* path with BN pre-folded into the depthwise
weights/bias (export.cpp_export.fold_conv_bn); training keeps the XLA
composition (backward needs the unfused intermediates anyway).

Contract: NHWC, stride 1, SAME 3x3 depthwise — exactly ConvDPUnit
(models/layers.py:conv_dp_unit, reference yunet_layer.py:4-36).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(relu: bool, rows: int, h: int, w: int, cout: int,
            x_ref, w1_ref, b1_ref, wd_ref, bd_ref, out_ref):
    # x_ref: (1, Hp+2, W+2, Cin) padded full image; out_ref: (1, rows, W, C)
    j = pl.program_id(1)
    band = x_ref[0, pl.ds(j * rows, rows + 2), :, :]
    rp2, wp2, cin = band.shape
    y1 = jnp.dot(band.reshape(rp2 * wp2, cin), w1_ref[...],
                 preferred_element_type=jnp.float32)
    y1 = (y1 + b1_ref[...]).reshape(rp2, wp2, cout)
    # the depthwise halo must be zero, but pw(0)+bias != 0 — zero out
    # everything that lies in the padded ring (global padded coords).
    # 3-D iota: Mosaic cannot minor-dim-reshape 1-bit masks.
    grow = jax.lax.broadcasted_iota(jnp.int32, (rp2, wp2, cout), 0) \
        + j * rows
    gcol = jax.lax.broadcasted_iota(jnp.int32, (rp2, wp2, cout), 1)
    interior = ((grow >= 1) & (grow <= h) & (gcol >= 1) & (gcol <= w))
    y1 = jnp.where(interior, y1, 0.0)
    acc = jnp.zeros((rows, w, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = wd_ref[dy * 3 + dx, :]
            acc = acc + y1[dy:dy + rows, dx:dx + w, :] * tap
    acc = acc + bd_ref[...]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[0] = acc.astype(out_ref.dtype)


def pad_for_bands(x, rows: int, n_blocks: int, h: int):
    """Zero-pad: 1-px halo left/right/top, bottom to one EXTRA row block so
    'block j+1' always exists (used by the banded training kernels)."""
    total_rows = (n_blocks + 1) * rows
    return jnp.pad(x, ((0, 0), (1, total_rows - h - 1), (1, 1), (0, 0)))


@functools.partial(jax.jit, static_argnames=("relu", "row_block"))
def fused_conv_dp(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
                  wd: jnp.ndarray, bd: jnp.ndarray, *, relu: bool = True,
                  row_block: int = 40) -> jnp.ndarray:
    """x: (N, H, W, Cin); w1: (1, 1, Cin, Cout) or (Cin, Cout);
    wd: (3, 3, 1, Cout) or (9, Cout). Returns (N, H, W, Cout)."""
    n, h, w, cin = x.shape
    w1 = w1.reshape(-1, w1.shape[-1])
    cout = w1.shape[-1]
    wd = wd.reshape(9, cout).astype(jnp.float32)
    rows = min(row_block, h)
    n_blocks = -(-h // rows)
    hp = n_blocks * rows
    xp = jnp.pad(x, ((0, 0), (1, 1 + hp - h), (1, 1), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, relu, rows, h, w, cout),
        out_shape=jax.ShapeDtypeStruct((n, hp, w, cout), x.dtype),
        grid=(n, n_blocks),
        in_specs=[
            pl.BlockSpec((1, hp + 2, w + 2, cin),
                         lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w1.shape[0], cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, w, cout),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(xp, w1.astype(jnp.float32), b1.reshape(1, cout).astype(jnp.float32),
      wd, bd.reshape(1, cout).astype(jnp.float32))
    return out[:, :h]
