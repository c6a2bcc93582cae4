"""Fundamental YuNet blocks as pure JAX functions (NHWC layout).

Semantics mirror the reference blocks in
mmdet/models/utils/yunet_layer.py:4-82 (ConvDPUnit: 1x1 pointwise conv with
bias, then 3x3 *depthwise* conv with bias, then optional BN+ReLU — note the
pointwise-then-depthwise order, the reverse of MobileNet), but the
implementation is TPU-first: NHWC activations, HWIO weights, functional
parameter pytrees, and BatchNorm whose running state is threaded explicitly
so data-parallel training can choose local-BN (per-shard statistics, the
reference's per-GPU BN behaviour) without framework magic.

Parameter pytree conventions
----------------------------
conv:        {"w": (kh, kw, cin, cout) f32, "b": (cout,) f32}
depthwise:   {"w": (kh, kw, 1, cout) f32, "b": (cout,) f32}
batchnorm:   params {"scale": (c,), "bias": (c,)}
             state  {"mean": (c,), "var": (c,)}
ConvDPUnit:  params {"conv1": conv, "conv2": depthwise[, "bn": bn-params]}
             state  {"bn": bn-state} (only when with_bn)
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5  # torch.nn.BatchNorm2d default, used by every BN in the model
BN_MOMENTUM = 0.1  # torch running-stat update: new = (1-m)*old + m*batch

Params = Dict[str, Any]
State = Dict[str, Any]


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def conv2d(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None,
           stride: int = 1, padding: int = 0,
           depthwise: bool = False) -> jnp.ndarray:
    """NHWC conv. Accumulates in f32 on the MXU regardless of input dtype."""
    groups = w.shape[-1] if depthwise else 1
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def batch_norm(x: jnp.ndarray, p: Params, s: State, *, train: bool,
               momentum: float = BN_MOMENTUM,
               eps: float = BN_EPS,
               group_size: int = 0) -> Tuple[jnp.ndarray, State]:
    """BatchNorm over (N, H, W). In train mode normalizes with the *local*
    batch statistics of this shard (matching the reference's per-GPU
    non-sync BN) and returns updated running stats; in eval mode uses the
    running stats and returns them unchanged.

    The variance used for normalization is the biased (population) batch
    variance; the running-var update uses the unbiased estimate — both
    exactly as torch.nn.BatchNorm2d does.

    group_size > 0 enables **GhostBN**: statistics are computed over
    fixed groups of ``group_size`` samples inside the batch (reshape
    (N,…) -> (N/g, g, …), normalize per group), reproducing the
    reference's per-GPU local-BN noise (batch-16 statistics per GPU,
    configs/yunet_n.py:30 samples_per_gpu=16) inside a single large-batch
    program. The running-stat update averages the per-group stats —
    exactly what per-shard local BN + the pmean state sync produce on a
    real N/g-device mesh. 0 (or group_size >= N) keeps whole-batch
    statistics and is bit-identical to the pre-GhostBN code path.
    """
    scale, bias = p["scale"], p["bias"]
    if train:
        n_b = x.shape[0]
        g = group_size if 0 < group_size < n_b else n_b
        if n_b % g:
            raise ValueError(
                f"GhostBN group_size {g} does not divide batch {n_b}")
        xf = x.astype(jnp.float32)
        # single-pass stats: E[x-c] and E[(x-c)^2] reduce the SAME read,
        # so XLA fuses them into one pass over x — the centered two-pass
        # form reads every BN input twice per step. Shifting by the
        # running mean c (~= batch mean) bounds the E[y^2] - E[y]^2
        # cancellation: the subtraction operates near zero even for
        # high-mean low-variance channels (advisor r2 finding #1).
        shift = jax.lax.stop_gradient(s["mean"].astype(jnp.float32))
        xc = xf - shift
        n = g * x.shape[1] * x.shape[2]
        if g == n_b:
            mean_c = jnp.mean(xc, axis=(0, 1, 2))
            mean_sq = jnp.mean(jnp.square(xc), axis=(0, 1, 2))
            var = jnp.maximum(mean_sq - jnp.square(mean_c), 0.0)
            mean = mean_c + shift
            unbiased = var * (n / max(n - 1, 1))
            mean_upd, var_upd = mean, unbiased
        else:
            ng = n_b // g
            xg = xc.reshape(ng, g, *x.shape[1:])
            mean_c = jnp.mean(xg, axis=(1, 2, 3))            # (ng, C)
            mean_sq = jnp.mean(jnp.square(xg), axis=(1, 2, 3))
            var_g = jnp.maximum(mean_sq - jnp.square(mean_c), 0.0)
            unbiased = var_g * (n / max(n - 1, 1))
            mean_g = mean_c + shift                          # (ng, C)
            mean_upd = jnp.mean(mean_g, axis=0)
            var_upd = jnp.mean(unbiased, axis=0)
            # per-group normalization, broadcast over (g, H, W); same
            # x - (mean_c + shift) association as the whole-batch path
            bc = (slice(None), None, None, None)
            inv_g = jax.lax.rsqrt(var_g + eps) * scale
            y = (xf.reshape(xg.shape) - mean_g[bc]) * inv_g[bc] + bias
            new_state = {
                "mean": (1.0 - momentum) * s["mean"] + momentum * mean_upd,
                "var": (1.0 - momentum) * s["var"] + momentum * var_upd,
            }
            return y.reshape(x.shape).astype(x.dtype), new_state
        new_state = {
            "mean": (1.0 - momentum) * s["mean"] + momentum * mean_upd,
            "var": (1.0 - momentum) * s["var"] + momentum * var_upd,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_state = s
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps) * scale
    y = (x.astype(jnp.float32) - mean) * inv + bias
    return y.astype(x.dtype), new_state


def relu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, 0)


# ---------------------------------------------------------------------------
# initializers (match reference init: xavier-normal conv weights, bias 0.02,
# BN scale 1 / bias 0 — yunet_backbone.py:21-31)
# ---------------------------------------------------------------------------

def _xavier_normal(key, kh, kw, cin, cout, groups: int = 1) -> jnp.ndarray:
    # torch fan_in/fan_out for Conv2d(OIHW): fan_in = (cin/groups)*kh*kw,
    # fan_out = cout*kh*kw/1 (torch divides fan_out by groups for the O dim
    # stored per group; with weight (cout, cin/groups, kh, kw):
    # fan_in=cin/groups*kh*kw, fan_out=cout/groups... torch uses
    # _calculate_fan_in_and_fan_out on the tensor: fan_in = size(1)*kh*kw,
    # fan_out = size(0)*kh*kw).
    fan_in = (cin // groups) * kh * kw
    fan_out = cout * kh * kw
    std = float(np.sqrt(2.0 / (fan_in + fan_out)))
    return jax.random.normal(key, (kh, kw, cin // groups, cout),
                             jnp.float32) * std


def conv_init(key, kh, kw, cin, cout, depthwise: bool = False) -> Params:
    groups = cout if depthwise else 1
    cin_eff = cout if depthwise else cin
    return {
        "w": _xavier_normal(key, kh, kw, cin_eff, cout, groups),
        "b": jnp.full((cout,), 0.02, jnp.float32),
    }


def bn_init(c: int) -> Tuple[Params, State]:
    p = {"scale": jnp.ones((c,), jnp.float32),
         "bias": jnp.zeros((c,), jnp.float32)}
    s = {"mean": jnp.zeros((c,), jnp.float32),
         "var": jnp.ones((c,), jnp.float32)}
    return p, s


# ---------------------------------------------------------------------------
# ConvDPUnit — reference yunet_layer.py:4-36
# ---------------------------------------------------------------------------

def conv_dp_unit_init(key, cin: int, cout: int,
                      with_bn: bool = True) -> Tuple[Params, State]:
    k1, k2 = jax.random.split(key)
    p: Params = {
        "conv1": conv_init(k1, 1, 1, cin, cout),
        "conv2": conv_init(k2, 3, 3, cout, cout, depthwise=True),
    }
    s: State = {}
    if with_bn:
        p["bn"], s_bn = bn_init(cout)
        s["bn"] = s_bn
    return p, s


def _bn_covered_bias(b: jnp.ndarray, train: bool) -> jnp.ndarray:
    """Bias of a conv whose output feeds train-mode BatchNorm directly.

    A per-channel constant added before train-mode BN is exactly cancelled
    by the batch-mean subtraction, so dL/db == 0 analytically (the BN
    input-gradient sums to zero over (N, H, W) per channel). XLA cannot
    see that and emits a full-HBM reduce_sum over dy for each such bias
    (~2 ms/step each at b128/640²). stop_gradient removes those passes;
    forward values, export paths, and the SGD weight-decay term on the
    bias are all unchanged.
    """
    return jax.lax.stop_gradient(b) if train else b


def _composed_pw_dw(p: Params, x: jnp.ndarray, b2) -> jnp.ndarray:
    """pw(1x1) then dw(3x3) with no nonlinearity between (reference
    yunet_layer.py:4-36) compose exactly into ONE dense 3x3 conv
    W[ky,kx,i,o] = pw[i,o] * dw[ky,kx,o], which removes the pointwise
    intermediate's HBM round-trip in BOTH directions — the ~419 MB
    stage-1/2 tensors at b128/640² are the largest line in the measured
    train-step roofline, and XLA never merges conv pairs on its own.
    The pointwise bias contributes a batch-independent field (interior:
    b1·Σdw taps; borders: fewer taps where the dw padding falls outside
    the image) reproduced exactly by one batch-1 depthwise conv over
    the constant b1 map. The composed conv runs ~6x more MXU MACs than
    the factored pair — free on an HBM-bound step (3% MFU).

    The bias field is evaluated in closed form, not as a conv: a
    depthwise 3x3 over a spatially-constant map depends only on which
    taps fall inside the image, i.e. out(y,x,c) = b1_c * sum of
    dw[ky,kx,c] over in-bounds taps + b2_c, and the in-bounds set
    factors into row/col validity masks — one tiny einsum. (The first
    cut ran a batch-1 depthwise conv over a broadcast b1 map; under a
    multi-process 'dp' mesh the SPMD partitioner resolved that
    batch-1-conv-plus-sharded-add differently than single-process,
    shifting bf16 rounding enough to break the 2-proc==1-proc
    bit-tight gate at step 1. The einsum is replicated scalar math —
    no partitioning freedom.)"""
    pw = p["conv1"]["w"][0, 0]                       # (cin, cout)
    dw = p["conv2"]["w"][:, :, 0]                    # (3, 3, cout)
    w = pw[None, None] * dw[:, :, None, :]           # (3, 3, cin, cout)
    y = conv2d(x, w, None, padding=1)
    b1 = p["conv1"]["b"]
    h, wd = x.shape[1], x.shape[2]
    ks = jnp.arange(3)
    rowm = (((ks[None, :] + jnp.arange(h)[:, None] - 1) >= 0)
            & ((ks[None, :] + jnp.arange(h)[:, None] - 1) < h))
    colm = (((ks[None, :] + jnp.arange(wd)[:, None] - 1) >= 0)
            & ((ks[None, :] + jnp.arange(wd)[:, None] - 1) < wd))
    taps = jnp.einsum("yi,ijc,xj->yxc", rowm.astype(dw.dtype), dw,
                      colm.astype(dw.dtype))         # (H, W, cout)
    field = b1 * taps
    if b2 is not None:
        field = field + b2
    return y + field[None].astype(y.dtype)


def conv_dp_unit(p: Params, s: State, x: jnp.ndarray, *,
                 train: bool = False,
                 fused: bool = False,
                 composed: bool = False,
                 bn_group: int = 0) -> Tuple[jnp.ndarray, State]:
    b2 = p["conv2"]["b"]
    if "bn" in p:
        b2 = _bn_covered_bias(b2, train)
    if fused:
        # single Pallas kernel (pw matmul + dw stencil, custom VJP) —
        # keeps the pointwise intermediate out of HBM in both directions
        from ..ops.convdp_train_pallas import fused_pw_dw
        # adaptive row block: sub-32-channel tensors are lane-padded to
        # 128 in VMEM, so the Mosaic stack is ~8x larger per band row —
        # use narrow bands there to stay inside the VMEM budget
        cin = p["conv1"]["w"].shape[-2]
        cout = p["conv1"]["w"].shape[-1]
        rb = 32 if min(cin, cout) >= 32 else 8
        x = fused_pw_dw(x, p["conv1"]["w"], p["conv1"]["b"],
                        p["conv2"]["w"], b2, rb)
    elif composed:
        x = _composed_pw_dw(p, x, b2)
    else:
        x = conv2d(x, p["conv1"]["w"], p["conv1"]["b"])
        x = conv2d(x, p["conv2"]["w"], b2, padding=1,
                   depthwise=True)
    if "bn" in p:
        x, new_bn = batch_norm(x, p["bn"], s["bn"], train=train,
                               group_size=bn_group)
        return relu(x), {"bn": new_bn}
    return x, {}


# ---------------------------------------------------------------------------
# Conv_head (stem) — reference yunet_layer.py:39-62
# ---------------------------------------------------------------------------

def conv_head_init(key, cin: int, cmid: int,
                   cout: int) -> Tuple[Params, State]:
    k1, k2 = jax.random.split(key)
    p: Params = {"conv1": conv_init(k1, 3, 3, cin, cmid)}
    p["bn1"], s_bn1 = bn_init(cmid)
    p["conv2"], s_conv2 = conv_dp_unit_init(k2, cmid, cout, with_bn=True)
    return p, {"bn1": s_bn1, "conv2": s_conv2}


def conv_head(p: Params, s: State, x: jnp.ndarray, *,
              train: bool = False,
              fused: bool = False,
              composed: bool = False,
              bn_group: int = 0) -> Tuple[jnp.ndarray, State]:
    x = conv2d(x, p["conv1"]["w"], _bn_covered_bias(p["conv1"]["b"], train),
               stride=2, padding=1)
    x, new_bn1 = batch_norm(x, p["bn1"], s["bn1"], train=train,
                            group_size=bn_group)
    x = relu(x)
    x, new_conv2 = conv_dp_unit(p["conv2"], s["conv2"], x, train=train,
                                fused=fused, composed=composed,
                                bn_group=bn_group)
    return x, {"bn1": new_bn1, "conv2": new_conv2}


# ---------------------------------------------------------------------------
# Conv4layerBlock — reference yunet_layer.py:65-82
# ---------------------------------------------------------------------------

def conv4layer_block_init(key, cin: int, cout: int,
                          with_bn: bool = True) -> Tuple[Params, State]:
    k1, k2 = jax.random.split(key)
    p1, s1 = conv_dp_unit_init(k1, cin, cin, with_bn=True)
    p2, s2 = conv_dp_unit_init(k2, cin, cout, with_bn=with_bn)
    return {"conv1": p1, "conv2": p2}, {"conv1": s1, "conv2": s2}


def conv4layer_block(p: Params, s: State, x: jnp.ndarray, *,
                     train: bool = False,
                     fused: bool = False,
                     composed: bool = False,
                     bn_group: int = 0) -> Tuple[jnp.ndarray, State]:
    x, n1 = conv_dp_unit(p["conv1"], s["conv1"], x, train=train,
                         fused=fused, composed=composed, bn_group=bn_group)
    x, n2 = conv_dp_unit(p["conv2"], s["conv2"], x, train=train,
                         fused=fused, composed=composed, bn_group=bn_group)
    return x, {"conv1": n1, "conv2": n2}
