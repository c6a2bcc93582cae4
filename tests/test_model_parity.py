"""Numerical parity of the JAX model vs the shipped reference weights.

Oracle = an independent torch.nn.functional interpreter of the checkpoint
(tests/torch_oracle.py). Tolerance mirrors the reference ONNX verification
gate (yunet2onnx.py:203-210: rtol 1e-2 / atol 1e-5); we use atol 2e-4 to
absorb conv-algorithm differences between XLA:CPU and torch MKL at the
magnitude of raw 0-255 inputs.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from yunet_tpu.config import yunet_n, yunet_s
from yunet_tpu.models import YuNet
from yunet_tpu.utils import load_pth_params

from torch_oracle import load_oracle


def _rand_img(h, w, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(1, h, w, 3)).astype(np.float32)


@pytest.mark.parametrize("variant,size", [("n", 160), ("n", 320),
                                          ("s", 160)])
def test_forward_matches_torch_oracle(variant, size, yunet_n_pth,
                                      yunet_s_pth):
    cfg = yunet_n() if variant == "n" else yunet_s()
    pth = yunet_n_pth if variant == "n" else yunet_s_pth
    model = YuNet(cfg.model)
    params, state = load_pth_params(
        pth, shared_stacked_convs=cfg.model.shared_stacked_convs)

    img = _rand_img(size, size, seed=42)
    outs, _ = model.forward(params, state, jnp.asarray(img), train=False)

    import torch
    oracle = load_oracle(pth, cfg.model.shared_stacked_convs)
    t_out = oracle.forward(torch.from_numpy(
        np.transpose(img, (0, 3, 1, 2))))

    for k in ("cls", "bbox", "obj", "kps"):
        for lvl in range(3):
            got = np.asarray(outs[k][lvl])  # NHWC
            want = t_out[k][lvl].numpy().transpose(0, 2, 3, 1)
            assert got.shape == want.shape, (k, lvl, got.shape, want.shape)
            np.testing.assert_allclose(
                got, want, rtol=1e-2, atol=2e-4,
                err_msg=f"branch {k} level {lvl}")


def test_param_count_matches_reference():
    # README.md:146-147 — 75,856 (n) / 54,608 (s)
    assert YuNet(yunet_n().model).num_params == 75856
    assert YuNet(yunet_s().model).num_params == 54608


def test_init_shapes_match_imported(yunet_n_pth):
    """Random-init tree must be structurally identical to an imported one."""
    import jax
    cfg = yunet_n()
    model = YuNet(cfg.model)
    p_init, s_init = model.init(jax.random.PRNGKey(0))
    p_load, s_load = load_pth_params(
        yunet_n_pth, shared_stacked_convs=cfg.model.shared_stacked_convs)

    def _paths(tree):
        return {jax.tree_util.keystr(kp): l.shape for kp, l in
                jax.tree_util.tree_flatten_with_path(tree)[0]}

    assert _paths(p_init) == _paths(p_load)
    assert _paths(s_init) == _paths(s_load)


def test_feature_test_order(yunet_n_pth):
    """feature_test returns 12 tensors in cls,obj,bbox,kps x 8,16,32 order
    with channel counts 1,1,4,10 (reference yunet2onnx.py:89-94)."""
    cfg = yunet_n()
    model = YuNet(cfg.model)
    params, state = load_pth_params(yunet_n_pth)
    outs = model.feature_test(params, state,
                              jnp.asarray(_rand_img(160, 160)))
    assert len(outs) == 12
    chans = [o.shape[-1] for o in outs]
    assert chans == [1, 1, 1, 1, 1, 1, 4, 4, 4, 10, 10, 10]
    # priors per level at 160x160: 400, 100, 25
    assert [o.shape[1] for o in outs[:3]] == [400, 100, 25]
