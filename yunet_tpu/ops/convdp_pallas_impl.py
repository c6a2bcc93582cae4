"""Shared band implementation for the fused ConvDPUnit kernels.

Row-band processing needs a 2-row halo, which Pallas blocked indexing can't
express as one overlapping block. Instead each kernel receives the SAME
padded array twice: block j (the band body) and block j+1 (whose first two
rows are the bottom halo). The array is padded with one extra zero block so
j+1 always exists; the top halo is the band's own first row (global zero
padding handles row -1). VMEM stays bounded by the band size and the Pallas
pipeline double-buffers the streamed blocks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _band(a_ref, b_ref):
    """(rows+2, W+2, C) halo band from body block + next block."""
    return jnp.concatenate([a_ref[0], b_ref[0, :2]], axis=0)


def _masked_y1(band, w1_ref, b1_ref, j, rows, h, w, cout):
    """Pointwise conv of the band with the padded ring zeroed (the
    depthwise conv's zero padding must see 0, not pw(0)+bias).

    Kept in the band's dtype: low-channel (16-lane) temporaries are
    lane-padded to 128 in VMEM, so f32 here would 8x the kernel's VMEM
    stack; a bf16 y1 also matches what the unfused composition
    materializes. The matmul still accumulates in f32 on the MXU.
    """
    rp2, wp2, cin = band.shape
    y1 = jnp.dot(band.reshape(rp2 * wp2, cin), w1_ref[...].astype(
        band.dtype), preferred_element_type=jnp.float32)
    y1 = (y1 + b1_ref[...]).astype(band.dtype).reshape(rp2, wp2, cout)
    grow = jax.lax.broadcasted_iota(jnp.int32, (rp2, wp2, cout), 0) \
        + j * rows
    gcol = jax.lax.broadcasted_iota(jnp.int32, (rp2, wp2, cout), 1)
    interior = ((grow >= 1) & (grow <= h) & (gcol >= 1) & (gcol <= w))
    return jnp.where(interior, y1, jnp.zeros((), band.dtype))


def fwd_kernel(relu: bool, rows: int, h: int, w: int, cout: int,
               xa_ref, xb_ref, w1_ref, b1_ref, wd_ref, bd_ref, out_ref):
    j = pl.program_id(1)
    band = _band(xa_ref, xb_ref)
    y1 = _masked_y1(band, w1_ref, b1_ref, j, rows, h, w, cout)
    acc = jnp.zeros((rows, w, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = wd_ref[dy * 3 + dx, :]
            acc = acc + y1[dy:dy + rows, dx:dx + w, :].astype(
                jnp.float32) * tap
    acc = acc + bd_ref[...]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[0] = acc.astype(out_ref.dtype)


def bwd_kernel(rows: int, h: int, w: int, cin: int, cout: int,
               xa_ref, xb_ref, dza_ref, dzb_ref, w1_ref, b1_ref, wd_ref,
               dx_ref, dw1_ref, db1_ref, dwd_ref, dbd_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dwd_ref[...] = jnp.zeros_like(dwd_ref)
        dbd_ref[...] = jnp.zeros_like(dbd_ref)

    xband = _band(xa_ref, xb_ref)
    y1 = _masked_y1(xband, w1_ref, b1_ref, j, rows, h, w, cout)
    dzb = _band(dza_ref, dzb_ref)

    dy1 = jnp.zeros((rows, w, cout), jnp.float32)
    dz_int = dzb[1:1 + rows, 1:1 + w, :].astype(jnp.float32)
    for dy in range(3):
        for dx_ in range(3):
            tap = wd_ref[dy * 3 + dx_, :]
            # z[r, c] consumed y1[r-1+dy, c-1+dx] =>
            # dy1[a, b] += wd[dy,dx] * dz[a+1-dy, b+1-dx]
            dy1 = dy1 + dzb[2 - dy:2 - dy + rows,
                            2 - dx_:2 - dx_ + w, :].astype(
                                jnp.float32) * tap
            # dwd[dy,dx,c] += sum y1[r-1+dy, c-1+dx, ch] * dz[r, c, ch]
            contrib = (y1[dy:dy + rows, dx_:dx_ + w, :].astype(
                jnp.float32) * dz_int)
            dwd_ref[dy * 3 + dx_, :] += contrib.sum(axis=(0, 1))
    # rows past H in the last band are phantoms, yet taps reaching back
    # into real dz rows give them nonzero dy1 — zero them (they feed db1;
    # dx discards them by slicing; dw1/dwd see zeros from x/y1 masking)
    out_row = (jax.lax.broadcasted_iota(jnp.int32, (rows, w, cout), 0)
               + j * rows)
    dy1 = jnp.where(out_row < h, dy1, 0.0)
    dbd_ref[0, :] += dz_int.sum(axis=(0, 1))

    dx = jnp.dot(dy1.reshape(rows * w, cout), w1_ref[...].T,
                 preferred_element_type=jnp.float32)
    dx_ref[0] = dx.reshape(rows, w, cin).astype(dx_ref.dtype)
    xint = xband[1:1 + rows, 1:1 + w, :].astype(jnp.float32)
    dw1_ref[...] += jnp.dot(xint.reshape(rows * w, cin).T,
                            dy1.reshape(rows * w, cout),
                            preferred_element_type=jnp.float32)
    db1_ref[0, :] += dy1.sum(axis=(0, 1))
