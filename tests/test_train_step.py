"""Train-step tests: loss composition, single-device vs 8-device SPMD
equivalence, LR schedule parity with the reference recipe."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from yunet_tpu.config import yunet_n
from yunet_tpu.models import YuNet
from yunet_tpu.train import init_train_state, make_train_step
from yunet_tpu.train.lr import lr_schedule, scale_lr


def _small_cfg():
    cfg = yunet_n()
    return dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, bf16=False))


def _batch(b, img, g=8, seed=0):
    rng = np.random.RandomState(seed)
    bb = np.sort(rng.uniform(5, img - 5, (b, g, 2, 2)).astype(np.float32),
                 axis=2)
    return {
        "image": jnp.asarray(
            rng.randint(0, 256, (b, img, img, 3)).astype(np.float32)),
        "gt_bboxes": jnp.asarray(
            np.concatenate([bb[:, :, 0, :], bb[:, :, 1, :]], -1)),
        "gt_labels": jnp.zeros((b, g), jnp.int32),
        "gt_kps": jnp.asarray(
            rng.uniform(5, img - 5, (b, g, 5, 3)).astype(np.float32)),
        "gt_valid": jnp.asarray(np.tile(np.arange(g) < 3, (b, 1))),
    }


def test_train_step_decreases_loss():
    cfg = _small_cfg()
    model = YuNet(cfg.model)
    ts, tx = init_train_state(cfg, steps_per_epoch=10, total_batch=4)
    step = make_train_step(cfg, model, tx, img_size=96)
    batch = _batch(4, 96)
    losses = []
    for _ in range(8):
        ts, m = step(ts, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert float(m["num_pos"]) > 0


def test_spmd_matches_single_device():
    """One fused-SPMD step over 8 devices == single-device step on the
    same global batch (both use per-shard BN over identical shard stats
    when every image is identical)."""
    cfg = _small_cfg()
    model = YuNet(cfg.model)
    b, img = 8, 96
    batch = _batch(b, img, seed=3)
    # identical images/gts in every batch row -> local BN == global BN
    one = jax.tree.map(lambda x: jnp.broadcast_to(x[:1], x.shape), batch)

    ts1, tx1 = init_train_state(cfg, steps_per_epoch=10, total_batch=b)
    step1 = make_train_step(cfg, model, tx1, img_size=img)
    out1, m1 = step1(ts1, one)

    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    ts8, tx8 = init_train_state(cfg, steps_per_epoch=10, total_batch=b)
    step8 = make_train_step(cfg, model, tx8, img_size=img, mesh=mesh)
    out8, m8 = step8(ts8, one)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(m1["num_pos"]), float(m8["num_pos"]))
    l1 = jax.tree_util.tree_leaves(out1.params)
    l8 = jax.tree_util.tree_leaves(out8.params)
    for a, c in zip(l1, l8):
        # atol 3e-5: the composed-ConvDP weight-grad (dW -> pw/dw chain)
        # reassociates under the 8-way psum with ~1e-5 absolute noise on
        # near-zero elements; a wrong collective (sum-for-mean, missing
        # shard) is an O(1) error this still catches
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-3, atol=3e-5)


@pytest.mark.parametrize("bf16", [False, True])
def test_train_step_both_precisions(bf16):
    """The f32 escape hatch (train.bf16=false — the reference's fp32
    default, mmdet/apis/train.py:182-189) and the bf16 default both step
    to a finite loss on the same batch."""
    cfg = yunet_n()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, bf16=bf16))
    model = YuNet(cfg.model)
    ts, tx = init_train_state(cfg, steps_per_epoch=10, total_batch=2)
    step = make_train_step(cfg, model, tx, img_size=96)
    ts, m = step(ts, _batch(2, 96))
    assert np.isfinite(float(m["loss"]))


def test_lr_schedule_reference_recipe():
    # lr 0.01, warmup 1500 iters ratio 1e-3, decay x0.1 at epochs 400/544
    sched = lr_schedule(0.01, steps_per_epoch=100, warmup_iters=1500,
                        warmup_ratio=0.001, decay_epochs=(400, 544),
                        decay_factor=0.1)
    np.testing.assert_allclose(float(sched(0)), 0.01 * 0.001, rtol=1e-4)
    np.testing.assert_allclose(float(sched(750)), 0.01 * 0.5005, rtol=1e-4)
    np.testing.assert_allclose(float(sched(1500)), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(sched(399 * 100)), 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(sched(400 * 100)), 0.001, rtol=1e-4)
    np.testing.assert_allclose(float(sched(544 * 100)), 0.0001, rtol=1e-4)
    assert scale_lr(0.01, 128) == pytest.approx(0.04)


def test_auto_scale_lr_off_by_default():
    # Reference parity: mmdet only rescales LR when auto_scale_lr is
    # explicitly enabled (mmdet/apis/train.py:71-114); the shipped configs
    # don't, so batch 16 on one chip must still use the base lr.
    from yunet_tpu.train.step import make_optimizer

    cfg = _small_cfg()
    assert cfg.train.auto_scale_lr is False

    # compare one SGD update magnitude: with wd=0, momentum=0, update = -lr*g
    base = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, weight_decay=0.0, momentum=0.0, warmup_iters=0,
            grad_clip=0.0))
    scaled = dataclasses.replace(
        base, train=dataclasses.replace(base.train, auto_scale_lr=True))
    for c, want in ((base, 0.01), (scaled, 0.01 * 16 / 32)):
        tx = make_optimizer(c, steps_per_epoch=10, total_batch=16)
        params = {"w": jnp.ones((4,))}
        st = tx.init(params)
        upd, _ = tx.update({"w": jnp.ones((4,))}, st, params)
        np.testing.assert_allclose(np.asarray(upd["w"]), -want, rtol=1e-6)


def test_bn_stats_update_in_train():
    cfg = _small_cfg()
    model = YuNet(cfg.model)
    ts, tx = init_train_state(cfg, steps_per_epoch=10, total_batch=2)
    step = make_train_step(cfg, model, tx, img_size=96)
    before = np.asarray(
        ts.state["backbone"]["model0"]["bn1"]["mean"]).copy()
    ts2, _ = step(ts, _batch(2, 96))
    after = np.asarray(ts2.state["backbone"]["model0"]["bn1"]["mean"])
    assert not np.allclose(before, after)


def test_bn_covered_bias_grads_are_analytically_zero(monkeypatch):
    """Biases of convs feeding train-mode BN directly have dL/db == 0, so
    the step skips their gradient reduce passes via stop_gradient
    (models/layers.py:_bn_covered_bias). Validate both halves: (a) with
    the optimization the returned bias grads are exactly zero and every
    other leaf matches plain autodiff; (b) plain autodiff itself confirms
    those bias grads are ~0 (the analytic claim)."""
    from yunet_tpu.models import layers
    from yunet_tpu.train.step import loss_fn
    from yunet_tpu.ops.priors import grid_priors

    cfg = _small_cfg()
    model = YuNet(cfg.model)
    ts, _ = init_train_state(cfg, steps_per_epoch=10, total_batch=2)
    batch = _batch(2, 96)
    sizes = [(96 // s, 96 // s) for s in cfg.model.strides]
    priors = jnp.asarray(grid_priors(sizes, cfg.model.strides,
                                     cfg.model.prior_offset))

    def grads_of(params):
        return jax.grad(lambda p: loss_fn(model, cfg, p, ts.state, batch,
                                          priors)[0])(params)

    g_opt = grads_of(ts.params)
    monkeypatch.setattr(layers, "_bn_covered_bias", lambda b, train: b)
    g_ref = grads_of(ts.params)

    covered = []

    # identify covered leaves structurally: conv2.b of any unit with a
    # sibling bn, and the stem conv1.b (sibling bn1)
    def mark(params, grads_o, grads_r, prefix=()):
        if not isinstance(params, dict):
            return
        keys = set(params)
        for k in keys:
            sub = params[k]
            if isinstance(sub, dict) and "conv2" in sub and "bn" in sub:
                covered.append(("/".join(prefix + (k, "conv2", "b")),
                                grads_o[k]["conv2"]["b"],
                                grads_r[k]["conv2"]["b"]))
            if isinstance(sub, dict) and "bn1" in sub and "conv1" in sub:
                covered.append(("/".join(prefix + (k, "conv1", "b")),
                                grads_o[k]["conv1"]["b"],
                                grads_r[k]["conv1"]["b"]))
            if isinstance(sub, dict):
                mark(sub, grads_o[k], grads_r[k], prefix + (k,))

    mark(ts.params, g_opt, g_ref)
    assert len(covered) >= 8  # stem + every BN'd ConvDPUnit

    covered_names = {n for n, _, _ in covered}
    for name, go, gr in covered:
        np.testing.assert_array_equal(
            np.asarray(go), 0.0, err_msg=f"{name}: optimized grad not zero")
        # analytic claim: plain autodiff agrees the grad is ~0 relative
        # to the largest bias grad in the model
        assert np.max(np.abs(np.asarray(gr))) < 1e-3, name

    # every non-covered leaf identical between the two programs
    flat_o = jax.tree_util.tree_leaves_with_path(g_opt)
    flat_r = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(g_ref)}
    for k, v in flat_o:
        ks = jax.tree_util.keystr(k)
        name = ks.replace("['", "").replace("']", "/").rstrip("/")
        if name in covered_names:
            continue
        np.testing.assert_allclose(np.asarray(v), np.asarray(flat_r[ks]),
                                   rtol=1e-6, atol=1e-7, err_msg=ks)


def test_remat_stages_bit_exact():
    """ModelConfig.remat_stages is a pure perf knob: jax.checkpoint
    recomputes the same ops, so one train step with stages 0-2
    rematerialized must produce bit-identical params, state, and metrics
    to the plain step (f32, CPU)."""
    cfg = _small_cfg()
    batch = _batch(2, 96, seed=7)

    outs = []
    for stages in ((), (0, 1, 2)):
        c = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, remat_stages=stages))
        model = YuNet(c.model)
        ts, tx = init_train_state(c, steps_per_epoch=10, total_batch=2)
        step = make_train_step(c, model, tx, img_size=96)
        outs.append(step(ts, batch))

    (ts_a, m_a), (ts_b, m_b) = outs
    np.testing.assert_array_equal(float(m_a["loss"]), float(m_b["loss"]))
    for a, b in zip(jax.tree_util.tree_leaves((ts_a.params, ts_a.state)),
                    jax.tree_util.tree_leaves((ts_b.params, ts_b.state))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_composed_dp_matches_factored():
    """ModelConfig.composed_dp runs each ConvDPUnit as ONE dense 3x3
    conv (pw and dw are linear with no activation between — reference
    yunet_layer.py:4-36 — so the composition is exact up to float
    reassociation, INCLUDING the border rows where the depthwise
    padding drops taps of the pointwise bias). One train step must
    match the factored step to f32-reassociation tolerance on loss,
    every grad-driven param, and the BN state."""
    cfg = _small_cfg()
    batch = _batch(2, 96, seed=11)

    outs = []
    for composed in (False, True):
        c = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, composed_dp=composed))
        model = YuNet(c.model)
        ts, tx = init_train_state(c, steps_per_epoch=10, total_batch=2)
        step = make_train_step(c, model, tx, img_size=96)
        outs.append(step(ts, batch))

    (ts_a, m_a), (ts_b, m_b) = outs
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-4)
    for (path_a, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path((ts_a.params,
                                                  ts_a.state))[0],
            jax.tree_util.tree_flatten_with_path((ts_b.params,
                                                  ts_b.state))[0]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5,
            err_msg=jax.tree_util.keystr(path_a))


def test_composed_dp_eval_forward_matches():
    """Eval-mode forward: composed vs factored output maps agree to
    float tolerance (the detect/export semantics are unchanged)."""
    cfg = _small_cfg()
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randint(0, 256, (1, 96, 96, 3)).astype(np.float32))
    model_a = YuNet(cfg.model)
    model_b = YuNet(dataclasses.replace(cfg.model, composed_dp=True))
    params, state = model_a.init(jax.random.PRNGKey(0))
    fa, _ = model_a.forward_flat(params, state, x, train=False)
    fb, _ = model_b.forward_flat(params, state, x, train=False)
    for k in fa:
        np.testing.assert_allclose(np.asarray(fa[k]), np.asarray(fb[k]),
                                   rtol=1e-4, atol=1e-4, err_msg=k)


# ---------------------------------------------------------------------------
# GhostBN (train.bn_group) — round-5 VERDICT #1: recipe-exact BN-16
# statistics inside the large-batch program
# ---------------------------------------------------------------------------

def test_ghost_bn_primitive_matches_per_group_local_bn():
    """batch_norm(group_size=g) == concatenated per-group local BN
    outputs, and its running-stat update == the mean of the per-group
    updates — exactly what per-shard local BN plus the pmean state sync
    produce on a real N/g-device mesh (train/step.py:198)."""
    from yunet_tpu.models.layers import batch_norm, bn_init

    rng = np.random.RandomState(0)
    n, h, w, c, g = 8, 5, 6, 12, 2
    x = jnp.asarray(rng.normal(3.0, 2.0, (n, h, w, c)).astype(np.float32))
    p, s = bn_init(c)
    p = {"scale": p["scale"] * 1.3, "bias": p["bias"] + 0.2}
    s = {"mean": jnp.asarray(rng.normal(0, 1, (c,)).astype(np.float32)),
         "var": jnp.abs(jnp.asarray(
             rng.normal(1, 0.2, (c,)).astype(np.float32)))}

    y, ns = batch_norm(x, p, s, train=True, group_size=g)

    ys, means, vars_ = [], [], []
    for i in range(n // g):
        yi, nsi = batch_norm(x[i * g:(i + 1) * g], p, s, train=True)
        ys.append(yi)
        means.append(nsi["mean"])
        vars_.append(nsi["var"])
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(jnp.concatenate(ys, 0)),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ns["mean"]),
                               np.mean(np.asarray(means), 0),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(ns["var"]),
                               np.mean(np.asarray(vars_), 0),
                               rtol=1e-6, atol=1e-7)


def test_ghost_bn_one_group_is_plain_bn():
    """group_size == N (one group) must be BIT-identical to group_size=0:
    the whole-batch code path is shared, so enabling bn_group on a run
    whose local batch already equals the group is a no-op."""
    from yunet_tpu.models.layers import batch_norm, bn_init

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.normal(0, 1, (4, 3, 3, 8)).astype(np.float32))
    p, s = bn_init(8)
    y0, ns0 = batch_norm(x, p, s, train=True, group_size=0)
    y1, ns1 = batch_norm(x, p, s, train=True, group_size=4)
    assert np.array_equal(np.asarray(y0), np.asarray(y1))
    assert np.array_equal(np.asarray(ns0["mean"]), np.asarray(ns1["mean"]))
    assert np.array_equal(np.asarray(ns0["var"]), np.asarray(ns1["var"]))
    with pytest.raises(ValueError):
        batch_norm(x, p, s, train=True, group_size=3)


def test_ghost_bn_step_matches_dp_mesh():
    """THE GhostBN equivalence claim: a single-device step at batch 16
    with bn_group=2 must reproduce an 8-device dp-mesh step on the same
    global batch (DIFFERENT rows per shard — each shard normalizes with
    its own local BN-2 statistics, which is exactly what the ghost
    groups compute)."""
    cfg = _small_cfg()
    b, img, g = 16, 96, 2
    batch = _batch(b, img, seed=7)

    cfg_ghost = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, bn_group=g))
    model = YuNet(cfg_ghost.model)
    ts1, tx1 = init_train_state(cfg_ghost, steps_per_epoch=10,
                                total_batch=b)
    step1 = make_train_step(cfg_ghost, model, tx1, img_size=img)
    out1, m1 = step1(ts1, batch)

    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    ts8, tx8 = init_train_state(cfg, steps_per_epoch=10, total_batch=b)
    step8 = make_train_step(cfg, model, tx8, img_size=img, mesh=mesh)
    out8, m8 = step8(ts8, batch)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(m1["num_pos"]), float(m8["num_pos"]))
    l1 = jax.tree_util.tree_leaves(out1.params)
    l8 = jax.tree_util.tree_leaves(out8.params)
    for a, c in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-3, atol=3e-5)
    s1 = jax.tree_util.tree_leaves(out1.state)
    s8 = jax.tree_util.tree_leaves(out8.state)
    for a, c in zip(s1, s8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-6)
