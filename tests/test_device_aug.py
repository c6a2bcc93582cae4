"""HBM-staged dataset + on-device augmentation (data/device_aug.py).

The device resample must reproduce the host pipeline's crop-canvas +
cv2.resize + flip (data/transforms.py) for identical geometry, the
geometry sampler must keep RandomSquareCrop's placement/retry semantics,
and the full device-aug train step must run (single device and 8-device
SPMD mesh)."""

import dataclasses
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


@pytest.fixture(scope="module")
def synth_tree(tmp_path_factory):
    import make_synth_wider as gen
    out = tmp_path_factory.mktemp("devaug")
    gen.main(["--out", str(out), "--train-n", "10", "--val-n", "2"])
    return out


def _smooth_img(rng, h, w):
    import cv2
    img = rng.randint(0, 256, (h // 8, w // 8, 3)).astype(np.uint8)
    return cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)


def test_resample_matches_host_pipeline():
    """Identical geometry through device_resample vs canvas-paste +
    cv2.resize (+flip): differences only from cv2's 5-bit interpolation
    weights (f32 matmuls on CPU devices)."""
    import cv2
    import jax.numpy as jnp
    from yunet_tpu.data.device_aug import device_resample
    from yunet_tpu.data.transforms import PAD_VALUE

    rng = np.random.RandomState(0)
    H = W = 160
    canvas = 288
    out_size = 96
    n = 4
    bank_np = np.full((n, canvas, canvas, 3), PAD_VALUE, np.uint8)
    for i in range(n):
        bank_np[i, :H, :W] = _smooth_img(rng, H, W)

    cases = []  # (idx, y0, x0, side, flip) incl. out-of-image crops
    for i in range(n):
        side = int(rng.choice([80, 120, 160, 200]))
        y0 = int(rng.randint(-40, H - side // 2))
        x0 = int(rng.randint(-40, W - side // 2))
        cases.append((i, y0, x0, side, bool(rng.rand() < 0.5)))

    idx = np.asarray([c[0] for c in cases], np.int32)
    y0 = np.asarray([c[1] for c in cases], np.float32)
    x0 = np.asarray([c[2] for c in cases], np.float32)
    side = np.asarray([c[3] for c in cases], np.float32)
    flip = np.asarray([c[4] for c in cases])

    args = (jnp.asarray(bank_np), jnp.asarray(idx), jnp.asarray(y0),
            jnp.asarray(x0), jnp.asarray(side), jnp.asarray(flip))
    got = np.asarray(device_resample(*args, out_size=out_size))
    # row-tiled y-stage (production path when max_scale is known):
    # max side 200 / out 96 -> bound 2.1; tile 32 -> strip 72 < 288,
    # so the tiling is real. The excluded tent taps are exact zeros; in
    # f32 the only deviation is FMA re-blocking of the contraction
    # (~1 ulp), and in bf16 (the production train dtype, where tap
    # products are exactly representable in the f32 accumulator) the
    # two paths are bit-identical.
    got_tiled = np.asarray(device_resample(
        *args, out_size=out_size, max_scale=2.1, tile=32))
    np.testing.assert_allclose(got, got_tiled, rtol=0, atol=1e-4)
    import jax.numpy as _jnp
    bf_dense = np.asarray(device_resample(
        *args, out_size=out_size, dtype=_jnp.bfloat16).astype(_jnp.float32))
    bf_tiled = np.asarray(device_resample(
        *args, out_size=out_size, max_scale=2.1, tile=32,
        dtype=_jnp.bfloat16).astype(_jnp.float32))
    np.testing.assert_array_equal(bf_dense, bf_tiled)

    for b, (i, yy, xx, s, fl) in enumerate(cases):
        # host reference: 128-padded crop canvas then cv2.resize
        patch = np.full((s, s, 3), PAD_VALUE, np.uint8)
        sy0, sy1 = max(0, yy), min(H, yy + s)
        sx0, sx1 = max(0, xx), min(W, xx + s)
        patch[sy0 - yy:sy1 - yy, sx0 - xx:sx1 - xx] = \
            bank_np[i, sy0:sy1, sx0:sx1]
        ref = cv2.resize(patch, (out_size, out_size)).astype(np.float32)
        if fl:
            ref = ref[:, ::-1]
        err = np.abs(got[b] - ref)
        assert err.mean() < 1.5 and err.max() < 12, (
            b, err.mean(), err.max())


def test_resample_out_of_canvas_blends_to_gray():
    import jax.numpy as jnp
    from yunet_tpu.data.device_aug import device_resample

    bank = np.zeros((1, 64, 64, 3), np.uint8)   # black image
    got = np.asarray(device_resample(
        jnp.asarray(bank), jnp.asarray([0]),
        jnp.asarray([-200.0]), jnp.asarray([-200.0]),
        jnp.asarray([64.0]), jnp.asarray([False]), out_size=32))
    np.testing.assert_allclose(got, 128.0, atol=1e-3)


def test_geometry_sampler_contract():
    from yunet_tpu.data.device_aug import sample_crop_geometry

    rng = np.random.RandomState(3)
    boxes = np.asarray([[50, 60, 90, 100], [300, 300, 360, 380]],
                       np.float32)
    for _ in range(50):
        patch, mask = sample_crop_geometry(
            400, 500, boxes, (0.5, 0.7, 0.9, 1.1, 1.3, 1.5), rng)
        assert patch[2] - patch[0] == patch[3] - patch[1]
        assert mask.any()
        c = (boxes[mask][:, :2] + boxes[mask][:, 2:]) / 2
        assert np.all((c[:, 0] > patch[0]) & (c[:, 0] < patch[2]))
        assert np.all((c[:, 1] > patch[1]) & (c[:, 1] < patch[3]))


def test_make_aug_sample_gt_semantics(synth_tree):
    """GTs from the geometry path: boxes inside the output square, kps
    clipped, flip applies the [1,0,2,4,3] landmark reorder."""
    from yunet_tpu.data.dataset import SampleSpec
    from yunet_tpu.data.device_aug import ImageBank, make_aug_sample
    from yunet_tpu.data.labelv2 import parse_labelv2

    recs = parse_labelv2(str(synth_tree / "train" / "labelv2.txt"))
    bank = ImageBank(recs, str(synth_tree / "train" / "images"),
                     bank_size=320, canvas=576)
    spec = SampleSpec(img_size=320, max_gts=32)
    n_flip = 0
    for i in range(len(bank)):
        rng = np.random.RandomState(100 + i)
        s = make_aug_sample(bank, i, rng, spec)
        n = int(s["gt_valid"].sum())
        assert n >= 1
        b = s["gt_bboxes"][:n]
        assert np.all(b[:, :2] >= -1e-3) and np.all(b[:, 2:] <= 320 + 1e-3)
        assert np.all(b[:, 2] >= b[:, 0]) and np.all(b[:, 3] >= b[:, 1])
        k = s["gt_kps"][:n]
        assert np.all(k[:, :, 0] >= -1e-3) and np.all(k[:, :, 0] <= 320.01)
        n_flip += int(s["aug_flip"])
        assert 0 < s["aug_side"]
    assert 0 < n_flip < len(bank)   # both branches exercised


def test_flip_reorders_landmarks(synth_tree):
    """Same sample with flip forced on/off: flipped kps equal the
    mirrored, reordered unflipped kps (reference transforms.py:473-486)."""
    from yunet_tpu.data.dataset import SampleSpec
    from yunet_tpu.data.device_aug import ImageBank, make_aug_sample
    from yunet_tpu.data.labelv2 import parse_labelv2
    from yunet_tpu.data.transforms import KPS_FLIP_ORDER

    recs = parse_labelv2(str(synth_tree / "train" / "labelv2.txt"))
    bank = ImageBank(recs, str(synth_tree / "train" / "images"),
                     bank_size=320, canvas=576)
    spec_no = SampleSpec(img_size=320, max_gts=32, flip_ratio=0.0)
    spec_yes = SampleSpec(img_size=320, max_gts=32, flip_ratio=1.0)
    a = make_aug_sample(bank, 0, np.random.RandomState(5), spec_no)
    b = make_aug_sample(bank, 0, np.random.RandomState(5), spec_yes)
    n = int(a["gt_valid"].sum())
    ka, kb = a["gt_kps"][:n], b["gt_kps"][:n]
    exp = ka[:, KPS_FLIP_ORDER, :].copy()
    exp[:, :, 0] = 320 - exp[:, :, 0]
    np.testing.assert_allclose(kb, exp, atol=1e-4)


def test_device_aug_loader_and_train_step(synth_tree):
    """Full integration on CPU: DeviceAugLoader batches + bank through
    make_train_step, single device and 8-device mesh."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from yunet_tpu.config import yunet_n
    from yunet_tpu.data.dataset import SampleSpec
    from yunet_tpu.data.device_aug import DeviceAugLoader
    from yunet_tpu.models import YuNet
    from yunet_tpu.train import init_train_state, make_train_step

    img = 96
    cfg = yunet_n()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, img_size=img, max_gts=16,
                                 device_aug=True, bank_size=img,
                                 bank_canvas=192),
        train=dataclasses.replace(cfg.train, bf16=False))
    spec = SampleSpec(img_size=img, max_gts=16)
    loader = DeviceAugLoader(
        str(synth_tree / "train" / "labelv2.txt"),
        str(synth_tree / "train" / "images"),
        batch_size=8, spec=spec, bank_size=img, bank_canvas=192)
    try:
        it = iter(loader)
        batch = next(it)
        assert batch["aug_idx"].shape == (8,)
        assert batch["gt_bboxes"].shape == (8, 16, 4)
        assert "image" not in batch

        model = YuNet(cfg.model)
        ts, tx = init_train_state(cfg, steps_per_epoch=10, total_batch=8)
        step = make_train_step(cfg, model, tx, img_size=img)
        bank = loader.bank.to_device()
        b = {k: jnp.asarray(v) for k, v in batch.items()
             if k != "num_overflow"}
        b["bank"] = bank
        ts, m = step(ts, b)
        assert np.isfinite(float(m["loss"]))

        # 8-device SPMD: replicated bank, batch-sharded geometry.
        # Identical rows so per-shard (local) BN equals whole-batch BN —
        # the same equivalence contract as test_spmd_matches_single_device.
        one = {k: np.broadcast_to(v[:1], v.shape).copy()
               for k, v in batch.items() if k != "num_overflow"}
        ts1, tx1 = init_train_state(cfg, steps_per_epoch=10, total_batch=8)
        step1 = make_train_step(cfg, model, tx1, img_size=img)
        b1 = {k: jnp.asarray(v) for k, v in one.items()}
        b1["bank"] = bank
        _, m1 = step1(ts1, b1)

        mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
        ts8, tx8 = init_train_state(cfg, steps_per_epoch=10, total_batch=8)
        step8 = make_train_step(cfg, model, tx8, img_size=img, mesh=mesh)
        shard = NamedSharding(mesh, P("dp"))
        b8 = {k: jax.device_put(v, shard) for k, v in one.items()}
        b8["bank"] = loader.bank.to_device(NamedSharding(mesh, P()))
        ts8 = jax.device_put(ts8, NamedSharding(mesh, P()))
        ts8, m8 = step8(ts8, b8)
        # SPMD step == single-device step on the same batch
        np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                                   rtol=2e-4)
    finally:
        loader.close()


def test_sharded_bank_mode(synth_tree):
    """device_shards: batch slots sample shard-locally, the sharded
    8-device train step runs, and every row's resampled image provably
    comes from that device's own bank slice."""
    import jax.numpy as jnp

    from yunet_tpu.data.dataset import SampleSpec
    from yunet_tpu.data.device_aug import (DeviceAugLoader,
                                           device_resample)

    img = 96
    spec = SampleSpec(img_size=img, max_gts=16)
    loader = DeviceAugLoader(
        str(synth_tree / "train" / "labelv2.txt"),
        str(synth_tree / "train" / "images"),
        batch_size=8, spec=spec, bank_size=img, bank_canvas=192,
        device_shards=2)
    try:
        assert loader.shard_len == 5          # 10 fixture imgs / 2 shards
        batch = next(iter(loader))
        # slots 0-3 sample sub-shard 0, 4-7 sub-shard 1; indices local
        assert batch["aug_idx"].max() < loader.shard_len

        # shard-locality proof: overwrite the bank with per-shard
        # constant colors and check each output row's color
        n = len(loader.bank)
        marked = np.zeros_like(loader.bank.images)
        half = n // 2
        marked[:half] = 50
        marked[half:] = 200
        out = device_resample(
            jnp.asarray(marked),
            jnp.asarray(batch["aug_idx"] +
                        np.repeat([0, half], 4).astype(np.int32)),
            jnp.asarray(np.zeros(8, np.float32)),
            jnp.asarray(np.zeros(8, np.float32)),
            jnp.asarray(np.full(8, 64.0, np.float32)),
            jnp.asarray(np.zeros(8, bool)), out_size=16)
        got = np.asarray(out).mean(axis=(1, 2, 3))
        assert np.all(got[:4] < 128) and np.all(got[4:] > 128)

        # fewer images than shards must be rejected
        with pytest.raises(ValueError):
            DeviceAugLoader(
                str(synth_tree / "train" / "labelv2.txt"),
                str(synth_tree / "train" / "images"),
                batch_size=16, spec=spec, bank_size=img, bank_canvas=192,
                device_shards=16)
    finally:
        loader.close()


def test_sharded_bank_spmd_step(tmp_path_factory):
    """8-way sharded bank through the SPMD train step (bank P('dp'))."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import make_synth_wider as gen
    from yunet_tpu.config import yunet_n
    from yunet_tpu.data.dataset import SampleSpec
    from yunet_tpu.data.device_aug import DeviceAugLoader
    from yunet_tpu.models import YuNet
    from yunet_tpu.train import init_train_state, make_train_step

    root = tmp_path_factory.mktemp("synth16")
    gen.main(["--out", str(root), "--train-n", "16", "--val-n", "2"])

    img = 96
    cfg = dataclasses.replace(
        yunet_n(),
        data=dataclasses.replace(yunet_n().data, img_size=img, max_gts=16,
                                 device_aug=True, bank_size=img,
                                 bank_canvas=192, bank_sharded=True),
        train=dataclasses.replace(yunet_n().train, bf16=False))
    spec = SampleSpec(img_size=img, max_gts=16)
    loader = DeviceAugLoader(
        str(root / "train" / "labelv2.txt"),
        str(root / "train" / "images"),
        batch_size=8, spec=spec, bank_size=img, bank_canvas=192,
        device_shards=8)
    try:
        assert loader.shard_len == 2
        batch = next(iter(loader))
        mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
        bank = loader.bank.to_device(NamedSharding(mesh, P("dp")))
        model = YuNet(cfg.model)
        ts, tx = init_train_state(cfg, steps_per_epoch=10, total_batch=8)
        step = make_train_step(cfg, model, tx, img_size=img, mesh=mesh)
        shard = NamedSharding(mesh, P("dp"))
        b = {k: jax.device_put(v, shard) for k, v in batch.items()
             if k != "num_overflow"}
        b["bank"] = bank
        ts, m = step(ts, b)
        assert np.isfinite(float(m["loss"]))
    finally:
        loader.close()


def test_multiprocess_bank_shards_are_uniform(synth_tree):
    """process_count > 1: per-host banks must be globally uniform in
    size (the P('dp') bank layout requires it), and the two hosts'
    record shards must be disjoint."""
    from yunet_tpu.data.dataset import SampleSpec
    from yunet_tpu.data.device_aug import DeviceAugLoader

    spec = SampleSpec(img_size=96, max_gts=16)
    kw = dict(batch_size=4, spec=spec, bank_size=96, bank_canvas=192,
              process_count=2)
    ann = str(synth_tree / "train" / "labelv2.txt")
    pre = str(synth_tree / "train" / "images")
    a = DeviceAugLoader(ann, pre, process_index=0, **kw)
    b = DeviceAugLoader(ann, pre, process_index=1, **kw)
    try:
        assert len(a.bank) == len(b.bank) == 5   # 10 imgs / 2 hosts
        fa = {r.filename for r in a.bank.records}
        fb = {r.filename for r in b.bank.records}
        assert not (fa & fb)
    finally:
        a.close()
        b.close()


def test_loader_seed_beyond_step_4294(synth_tree):
    """Per-sample seeds must stay inside numpy's 2^32 bound at high
    global steps (regression: the 1000003*step stride overflowed and
    crashed a 9472-step run at ~step 4300)."""
    from yunet_tpu.data.dataset import SampleSpec
    from yunet_tpu.data.device_aug import DeviceAugLoader

    spec = SampleSpec(img_size=96, max_gts=16)
    ld = DeviceAugLoader(
        str(synth_tree / "train" / "labelv2.txt"),
        str(synth_tree / "train" / "images"),
        batch_size=4, spec=spec, bank_size=96, bank_canvas=192,
        start_step=6000)
    try:
        b = next(iter(ld))
        assert b["gt_valid"].any()
    finally:
        ld.close()


def test_device_aug_loader_resume(synth_tree):
    """start_step resumes the epoch/step stream exactly (the TrainLoader
    resume contract, data/loader.py:99-109)."""
    from yunet_tpu.data.dataset import SampleSpec
    from yunet_tpu.data.device_aug import DeviceAugLoader

    spec = SampleSpec(img_size=96, max_gts=16)
    kw = dict(batch_size=4, spec=spec, seed=11, bank_size=96,
              bank_canvas=192)
    ann = str(synth_tree / "train" / "labelv2.txt")
    pre = str(synth_tree / "train" / "images")
    a = DeviceAugLoader(ann, pre, **kw)
    try:
        it = iter(a)
        skipped = [next(it) for _ in range(3)]
        want = next(it)
    finally:
        a.close()
    b = DeviceAugLoader(ann, pre, start_step=3, **kw)
    try:
        got = next(iter(b))
    finally:
        b.close()
    del skipped
    for k in want:
        np.testing.assert_array_equal(got[k], want[k])


def test_bank_capacity_guard():
    """to_device must fail at STAGING time with sized arithmetic and the
    bank_sharded/host-pipeline alternatives when the bank exceeds free
    HBM — not as a raw backend OOM (real WIDER train is ~51 GB replicated,
    vs a 16 GB v5e chip)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from yunet_tpu.data.device_aug import ImageBank

    bank = ImageBank.__new__(ImageBank)
    bank.images = np.zeros((8, 64, 64, 3), np.uint8)  # 96 KiB
    bank.canvas = 64
    nbytes = bank.images.nbytes

    # replicated bank over budget -> actionable error
    tight = {"bytes_limit": nbytes, "bytes_in_use": nbytes // 2}
    with pytest.raises(RuntimeError) as ei:
        bank._check_capacity(None, _stats=tight)
    msg = str(ei.value)
    assert "bank_sharded" in msg and "GB" in msg and "device_aug=false" in msg

    # the SAME budget passes once the bank is sharded 4-ways over 'dp'
    mesh = Mesh(np.array(jax.devices()[:4]), ("dp",))
    sharded = NamedSharding(mesh, P("dp"))
    bank._check_capacity(sharded, _stats=tight)  # 1/4 per device: fits

    # backend without HBM accounting (CPU): guard is a no-op
    bank._check_capacity(None, _stats={})

    # comfortable budget: no error
    bank._check_capacity(None, _stats={"bytes_limit": nbytes * 100,
                                       "bytes_in_use": 0})


def test_sharded_bank_matches_replicated(tmp_path_factory):
    """Sharded-bank training == replicated-bank training on the same
    batches (8 devices): with per-slot shard-local indices rewritten to
    global indices, the P('dp')-sharded bank step and the replicated-bank
    step must produce bit-identical params, BN state, and metrics —
    sharding is a layout choice, not a semantics choice (the
    DistributedGroupSampler role, reference samplers/group_sampler.py:51+)."""
    import dataclasses
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import make_synth_wider as gen
    from yunet_tpu.config import yunet_n
    from yunet_tpu.data.dataset import SampleSpec
    from yunet_tpu.data.device_aug import DeviceAugLoader
    from yunet_tpu.models import YuNet
    from yunet_tpu.train import init_train_state, make_train_step

    root = tmp_path_factory.mktemp("synth16eq")
    gen.main(["--out", str(root), "--train-n", "16", "--val-n", "2"])

    img = 96
    base = yunet_n()
    data = dataclasses.replace(base.data, img_size=img, max_gts=16,
                               device_aug=True, bank_size=img,
                               bank_canvas=192)
    cfg_sh = dataclasses.replace(
        base, data=dataclasses.replace(data, bank_sharded=True),
        train=dataclasses.replace(base.train, bf16=False))
    cfg_re = dataclasses.replace(
        base, data=dataclasses.replace(data, bank_sharded=False),
        train=dataclasses.replace(base.train, bf16=False))

    spec = SampleSpec(img_size=img, max_gts=16)
    loader = DeviceAugLoader(
        str(root / "train" / "labelv2.txt"),
        str(root / "train" / "images"),
        batch_size=8, spec=spec, bank_size=img, bank_canvas=192,
        device_shards=8)
    try:
        batches = [next(iter(loader)) for _ in range(2)]
        shard_len = loader.shard_len
        mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
        shard = NamedSharding(mesh, P("dp"))
        repl = NamedSharding(mesh, P())
        bank_sh = loader.bank.to_device(shard)
        bank_re = loader.bank.to_device(repl)

        model = YuNet(cfg_sh.model)
        ts0, tx = init_train_state(cfg_sh, steps_per_epoch=10,
                                   total_batch=8)
        step_sh = make_train_step(cfg_sh, model, tx, img_size=img,
                                  mesh=mesh)
        step_re = make_train_step(cfg_re, model, tx, img_size=img,
                                  mesh=mesh)

        import jax.numpy as jnp

        def run(step, bank, ts, to_global):
            ms = []
            for batch in batches:
                b = {k: v for k, v in batch.items() if k != "num_overflow"}
                if to_global:
                    # undo the loader's shard-local rewrite: slot j lives
                    # on device j (batch 8 over 8 shards)
                    b["aug_idx"] = (b["aug_idx"]
                                    + np.arange(8, dtype=np.int32)
                                    * shard_len)
                b = {k: jax.device_put(v, shard) for k, v in b.items()}
                b["bank"] = bank
                ts, m = step(ts, b)
                ms.append(m)
            return ts, ms

        # the step donates its TrainState argument: run each variant on
        # its own copy of the identical init
        ts_sh, ms_sh = run(step_sh, bank_sh, jax.tree.map(jnp.copy, ts0),
                           False)
        ts_re, ms_re = run(step_re, bank_re, jax.tree.map(jnp.copy, ts0),
                           True)
        for a, b in zip(ms_sh, ms_re):
            for k in a:
                np.testing.assert_array_equal(np.asarray(a[k]),
                                              np.asarray(b[k]), err_msg=k)
        jax.tree.map(
            lambda x, y: np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y)),
            ts_sh.params, ts_re.params)
        jax.tree.map(
            lambda x, y: np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y)),
            ts_sh.state, ts_re.state)
    finally:
        loader.close()
