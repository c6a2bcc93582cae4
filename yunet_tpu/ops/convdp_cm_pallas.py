"""Channels-major fused ConvDPUnit kernel (prototype).

Round-1 finding (convdp_train_pallas.py): NHWC bands put the 16-64
channel axis in the 128-wide lane dimension (2-8x VPU waste) and tap
shifts along W land in sublanes, which Mosaic lowers as vector
relayouts. This kernel flips the layout:

  activations: (H, C, W*N)   - N = batch, padded to a multiple of 128,
                               minor in the W*N flattening
  - the batch fills the lane dimension exactly (the same trick XLA's
    batch-minor conv layouts use at batch 128);
  - C sits in sublanes, where the pointwise contraction wants it:
    pw = per-row MXU matmul (Cout x Cin) @ (Cin x (wcols+2)*N);
  - a +-1 shift in w moves the lane index by exactly N (>= one full
    128-lane tile), so every depthwise tap is a lane-tile-aligned
    slice - pure addressing, no relayout;
  - a +-1 shift in h moves along the outer dim - also free.

Blocking: grid (h_blocks, w_blocks); refs are the main (r, C, wcols*N)
block plus thin bottom (2 rows), right (2 columns) and corner halos, so
input DMA overhead is (r+2)(wcols+2)/(r*wcols) instead of the 2x of the
dual-full-block scheme. The stored array carries one zero row on top /
one zero column (N lanes) on the left and is padded to block multiples
bottom/right, so halo indices always exist; out-of-image taps are
zeros by construction.

Weights: w1 (Cin, Cout) f32, applied as (Cout, Cin) lhs; wd (9, Cout)
with tap t = dy*3+dx; per-tap per-channel scalars broadcast over lanes
from a (Cout, 1) column.

FINDINGS (v5e, round 2, measured with true readback sync): the layout
works — numerics are exact (max err 0 vs XLA f32) and the round-1 3x
relayout tax is gone. But at stage2 scale (64->64, 160^2, b128, bf16)
the kernel is ~par with XLA's unfused pw+dw once the input pad copy is
excluded, and ~25% slower including it. Root cause is structural: the
depthwise 9-tap stencil as VPU multiply-adds needs 9 FMAs/element
(~19G f32 FMA/unit here, >= ~4.8 ms of VPU time), while XLA lowers
depthwise onto the MXU, where that work is free. The HBM traffic saved
by keeping y1 in VMEM (~1 ms) is smaller than the VPU time added, so
fusing pw+dw in a stencil-style kernel cannot beat XLA at these shapes.
A winning version would need the taps expressed as an MXU matmul
(stack 9 shifted y1 slices along sublanes, multiply by a 64x576
block-diagonal tap matrix) AND pad-free chaining; kept here as a
documented experiment, not wired into the model.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(r, wcols, n, h, w, cin, cout, relu,
                xm_ref, xr_ref, xb_ref, xc_ref, w1_ref, b1_ref, wd_ref,
                bd_ref, out_ref):
    j = pl.program_id(0)

    # assemble the (r+2, cin, (wcols+2)*n) halo slab
    top = jnp.concatenate([xm_ref[...], xr_ref[...]], axis=2)
    bot = jnp.concatenate([xb_ref[...], xc_ref[...]], axis=2)
    slab = jnp.concatenate([top, bot], axis=0)

    w1t = w1_ref[...]                    # (cout, cin) f32
    b1 = b1_ref[...]                     # (cout, 1) f32
    dt = slab.dtype

    # pointwise per slab row; keep y1 in input dtype (matches what the
    # unfused composition materializes)
    y1 = [
        (jnp.dot(w1t.astype(dt), slab[i],
                 preferred_element_type=jnp.float32)
         + b1).astype(dt)
        for i in range(r + 2)
    ]

    # zero out-of-image y1 so the depthwise zero padding is exact:
    # stored row 0 / col 0 are zeros already, but pw adds the bias there,
    # and the bottom/right pad blocks contain pw(0)+b too.
    # global row of slab row i = j*r + i - 1 ; valid rows are [0, h)
    # global col of lane-group g = k*wcols + g - 1 ; valid cols [0, w)
    k = pl.program_id(1)
    lanes = (wcols + 2) * n
    gcol = jax.lax.broadcasted_iota(jnp.int32, (cout, lanes), 1) // n \
        + k * wcols - 1
    col_ok = (gcol >= 0) & (gcol < w)
    zero = jnp.zeros((), dt)
    for i in range(r + 2):
        grow = j * r + i - 1
        row_ok = (grow >= 0) & (grow < h)
        y1[i] = jnp.where(col_ok & row_ok, y1[i], zero)

    wd = wd_ref[...]                     # (9, cout) f32
    bd = bd_ref[...]                     # (cout, 1) f32
    wn = wcols * n
    outs = []
    for i in range(r):                   # output slab row
        a = jnp.zeros((cout, wn), jnp.float32)
        for dy in range(3):
            row = y1[i + dy]
            for dx in range(3):
                tap = wd[dy * 3 + dx, :].reshape(cout, 1)
                a = a + row[:, dx * n:dx * n + wn].astype(jnp.float32) \
                    * tap
        a = a + bd
        if relu:
            a = jnp.maximum(a, 0.0)
        outs.append(a.astype(out_ref.dtype))
    out_ref[...] = jnp.stack(outs, axis=0)


def fused_conv_dp_cm_impl(x: jnp.ndarray, w1: jnp.ndarray,
                          b1: jnp.ndarray, wd: jnp.ndarray,
                          bd: jnp.ndarray, *, w: int, n: int,
                          relu: bool = False, row_block: int = 8,
                          wcol_block: int = 40) -> jnp.ndarray:
    """Explicit-shape variant: x (H, Cin, W*N), returns (H, Cout, W*N)."""
    h, cin, wn_in = x.shape
    assert wn_in == w * n and n % 128 == 0, (wn_in, w, n)
    w1 = w1.reshape(-1, w1.shape[-1]).astype(jnp.float32)
    cout = w1.shape[-1]
    wd = wd.reshape(9, cout).astype(jnp.float32)

    r = min(row_block, h)
    wcols = min(wcol_block, w)
    assert r % 2 == 0 or r == h, r
    assert wcols % 2 == 0 or wcols == w, wcols
    n_hb = -(-h // r)
    n_wb = -(-w // wcols)
    # stored layout: 1 zero row top, 1 zero col (n lanes) left, padded to
    # one extra halo-block bottom/right
    hp = 1 + n_hb * r + 2
    wp = 1 + n_wb * wcols + 2
    xp = jnp.pad(x, ((1, hp - h - 1), (0, 0), (n, (wp - w - 1) * n)))

    r2 = max(r // 2, 1)
    wc2 = max(wcols // 2, 1)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, r, wcols, n, h, w, cin, cout,
                          relu),
        grid=(n_hb, n_wb),
        in_specs=[
            # main block: stored rows [1+j*r-1 .. ) -> use index maps on
            # the padded array where stored row (j*r) = global row j*r-1
            pl.BlockSpec((r, cin, wcols * n),
                         lambda j, k: (j, 0, k)),
            # right halo: 2 columns (2n lanes)
            pl.BlockSpec((r, cin, 2 * n),
                         lambda j, k: (j, 0, (k + 1) * wcols // 2)),
            # bottom halo: 2 rows
            pl.BlockSpec((2, cin, wcols * n),
                         lambda j, k: ((j + 1) * r // 2, 0, k)),
            # corner: 2 rows x 2 cols
            pl.BlockSpec((2, cin, 2 * n),
                         lambda j, k: ((j + 1) * r // 2, 0,
                                       (k + 1) * wcols // 2)),
            pl.BlockSpec((cout, cin), lambda j, k: (0, 0)),
            pl.BlockSpec((cout, 1), lambda j, k: (0, 0)),
            pl.BlockSpec((9, cout), lambda j, k: (0, 0)),
            pl.BlockSpec((cout, 1), lambda j, k: (0, 0)),
        ],
        out_specs=pl.BlockSpec((r, cout, wcols * n),
                               lambda j, k: (j, 0, k)),
        out_shape=jax.ShapeDtypeStruct((n_hb * r, cout, n_wb * wcols * n),
                                       x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(xp, xp, xp, xp,
      w1.T, b1.reshape(cout, 1).astype(jnp.float32), wd,
      bd.reshape(cout, 1).astype(jnp.float32))
    if n_hb * r != h or n_wb * wcols != w:
        out = out[:h, :, :w * n]
    return out
