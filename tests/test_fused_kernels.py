"""Fused Pallas kernel tests (interpret mode on CPU): forward parity and
full gradient check of the custom VJP against the XLA composition."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yunet_tpu.models.layers import conv2d
from yunet_tpu.ops.convdp_pallas import fused_conv_dp
from yunet_tpu.ops.convdp_train_pallas import fused_pw_dw


def _unit_params(ci, co, seed):
    rng = np.random.RandomState(seed)
    return (jnp.asarray(rng.randn(1, 1, ci, co).astype(np.float32) * 0.2),
            jnp.asarray(rng.randn(co).astype(np.float32) * 0.2),
            jnp.asarray(rng.randn(3, 3, 1, co).astype(np.float32) * 0.2),
            jnp.asarray(rng.randn(co).astype(np.float32) * 0.2))


def _ref(x, w1, b1, wd, bd, relu):
    y = conv2d(conv2d(x, w1, b1), wd, bd, padding=1, depthwise=True)
    return jnp.maximum(y, 0) if relu else y


@pytest.mark.parametrize("shape,rb", [((2, 37, 45, 16, 64), 16),
                                      ((1, 20, 20, 64, 64), 40),
                                      ((1, 33, 64, 3, 16), 8)])
def test_fused_conv_dp_forward(shape, rb):
    n, h, w, ci, co = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, h, w, ci).astype(np.float32))
    w1, b1, wd, bd = _unit_params(ci, co, 1)
    for relu in (True, False):
        got = fused_conv_dp(x, w1, b1, wd, bd, relu=relu, row_block=rb)
        want = _ref(x, w1, b1, wd, bd, relu)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape,rb", [((2, 21, 19, 8, 16), 8),
                                      ((1, 40, 40, 16, 64), 40),
                                      ((2, 20, 20, 3, 16), 10)])
def test_fused_pw_dw_gradients(shape, rb):
    """All five gradients of the custom VJP == XLA composition."""
    n, h, w, ci, co = shape
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(n, h, w, ci).astype(np.float32))
    args = (x,) + _unit_params(ci, co, 3)

    def loss_ref(a):
        return (_ref(*a, relu=False) ** 2).sum()

    def loss_fused(a):
        return (fused_pw_dw(*a, rb) ** 2).sum()

    gr = jax.grad(loss_ref)(args)
    gf = jax.grad(loss_fused)(args)
    names = ("dx", "dw1", "db1", "dwd", "dbd")
    for name, a, b in zip(names, gf, gr):
        scale = float(jnp.abs(b).max()) + 1e-9
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale,
            atol=2e-6, err_msg=name)


def test_fused_unit_in_model_path():
    """conv_dp_unit(fused=True) == conv_dp_unit(fused=False), incl. BN."""
    from yunet_tpu.models.layers import conv_dp_unit, conv_dp_unit_init
    p, s = conv_dp_unit_init(jax.random.PRNGKey(0), 16, 64, with_bn=True)
    x = jnp.asarray(np.random.RandomState(4).randn(2, 24, 24, 16)
                    .astype(np.float32))
    y_ref, s_ref = conv_dp_unit(p, s, x, train=True, fused=False)
    y_f, s_f = conv_dp_unit(p, s, x, train=True, fused=True)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s_f["bn"]["mean"]), np.asarray(s_ref["bn"]["mean"]),
        rtol=1e-5, atol=1e-6)
