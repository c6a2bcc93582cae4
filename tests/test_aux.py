"""Auxiliary subsystem tests: EMA, hooks, config overrides, flops, apis,
checkpointing, parallel helpers."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yunet_tpu.config import apply_overrides, yunet_n, yunet_s
from yunet_tpu.train.ema import exp_momentum, linear_momentum, ema_update
from yunet_tpu.train.hooks import SampleSizeStatistics, MemoryProfiler
from yunet_tpu.utils.flops import count_macs
from yunet_tpu.utils.env import collect_env


def test_exp_momentum_warmup():
    f = exp_momentum(0.0002, total_iter=2000)
    # early: close to 1 (fast copy); late: ~m0
    assert float(f(0)) > 0.99
    assert abs(float(f(100000)) - 0.0002) < 1e-6
    g = linear_momentum(0.9, warm_up=100)
    assert float(g(0)) == pytest.approx(0.01, abs=1e-6)


def test_ema_update_tree():
    ema = {"a": jnp.zeros(3)}
    p = {"a": jnp.ones(3)}
    out = ema_update(ema, p, 0.25)
    np.testing.assert_allclose(np.asarray(out["a"]), 0.25)


def test_config_overrides():
    cfg = apply_overrides(yunet_n(), ["train.lr=0.02",
                                      "data.max_gts=64",
                                      "test.score_thr=0.5",
                                      "model.strides=[8,16,32]"])
    assert cfg.train.lr == 0.02
    assert cfg.data.max_gts == 64
    assert cfg.test.score_thr == 0.5
    assert cfg.model.strides == (8, 16, 32)
    with pytest.raises(KeyError):
        apply_overrides(cfg, ["nope.x=1"])


def test_config_override_bools():
    """CLI-style lowercase booleans must become real bools — the truthy
    string 'false' silently left train.bf16 on (found when the f32 A/B
    run duplicated the bf16 run bit-for-bit)."""
    cfg = apply_overrides(yunet_n(), ["train.bf16=false",
                                      "train.auto_scale_lr=true",
                                      "data.device_aug=True"])
    assert cfg.train.bf16 is False
    assert cfg.train.auto_scale_lr is True
    assert cfg.data.device_aug is True
    with pytest.raises(ValueError):
        apply_overrides(cfg, ["train.bf16=nope"])


def test_macs_match_reference_table():
    # README.md:146-147 — 149 / 96 MFLOPs @320 (mmcv counter, ~1.5% slack)
    assert count_macs(yunet_n().model) / 1e6 == pytest.approx(149, rel=0.02)
    assert count_macs(yunet_s().model) / 1e6 == pytest.approx(96, rel=0.02)


def test_sample_size_statistics():
    s = SampleSizeStatistics()
    batch = {
        "gt_bboxes": np.asarray([[[0, 0, 10, 10], [0, 0, 100, 100]]],
                                np.float32),
        "gt_valid": np.asarray([[True, True]]),
    }
    s.update(batch)
    assert s.total == 2
    assert s.summary()["8-16"] == 1
    assert s.summary()["64-128"] == 1


def test_memory_profiler():
    assert MemoryProfiler.rss_mb() > 1.0


def test_collect_env_keys():
    info = collect_env()
    assert "JAX" in info and "devices" in info


def test_checkpoint_roundtrip(tmp_path):
    from yunet_tpu.train import init_train_state
    from yunet_tpu.train.checkpoint import (find_latest_checkpoint,
                                            load_checkpoint,
                                            save_checkpoint)
    cfg = yunet_n()
    ts, _ = init_train_state(cfg, steps_per_epoch=10, total_batch=4)
    ts = ts._replace(step=jnp.asarray(42, jnp.int32))
    path = save_checkpoint(str(tmp_path), ts, epoch=7)
    assert find_latest_checkpoint(str(tmp_path)) == path

    ts2, _ = init_train_state(cfg, steps_per_epoch=10, total_batch=4)
    ts2, meta = load_checkpoint(path, ts2)
    assert int(ts2.step) == 42
    assert meta["epoch"] == 7
    a = jax.tree_util.tree_leaves(ts.params)
    b = jax.tree_util.tree_leaves(ts2.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_parallel_helpers():
    from yunet_tpu.parallel import make_mesh, shard_batch
    mesh = make_mesh(8)
    assert mesh is not None and mesh.size == 8
    batch = {"x": np.zeros((16, 4), np.float32)}
    out = shard_batch(batch, mesh)
    assert out["x"].sharding.spec == jax.sharding.PartitionSpec("dp")
    assert make_mesh(1) is None


def test_apis_init_and_inference(yunet_n_pth):
    from yunet_tpu.apis import inference_detector, init_detector
    det = init_detector("yunet_n", yunet_n_pth)
    img = np.random.RandomState(0).randint(
        0, 255, (96, 128, 3)).astype(np.uint8)
    r = inference_detector(det, img)
    assert set(r) == {"bboxes", "kps", "labels"}
    rs = inference_detector(det, [img, img])
    assert len(rs) == 2
    np.testing.assert_allclose(rs[0]["bboxes"], rs[1]["bboxes"])


def test_autorank(tmp_path):
    from yunet_tpu.utils.autorank import AutoRank
    log = tmp_path / "eval.log"
    ar = AutoRank(str(log))
    ar.update({"easy": 0.5, "medium": 0.4, "hard": 0.3}, tag="a")
    ar.update({"easy": 0.9, "medium": 0.8, "hard": 0.7}, tag="b")
    rows = [ln for ln in log.read_text().splitlines() if ln]
    import json
    assert json.loads(rows[0])["tag"] == "b"  # sorted by hard desc


def test_widerface_eval_mode_mapping():
    """Numeric protocol modes map exactly as tools/test_widerface.py
    (reference tools/test_widerface.py:76-97)."""
    import pytest
    from yunet_tpu.eval import widerface_eval_mode

    assert widerface_eval_mode(0) == (640, 640)
    assert widerface_eval_mode(1) == (1650, 1100)
    assert widerface_eval_mode(2) == "ORIGIN"
    assert widerface_eval_mode(320) == (320, 320)
    for bad in (3, 30, -1):
        with pytest.raises(ValueError):
            widerface_eval_mode(bad)


def test_graft_entry_single_chip():
    """__graft_entry__.entry() returns a jittable forward that runs on
    the test backend (the driver compile-checks exactly this)."""
    import sys, os
    import jax
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert set(out) == {"cls", "bbox", "obj", "kps"}
    assert all(v.shape[1] == 8400 for v in out.values())


def test_small_tool_mains_smoke(yunet_n_pth, tmp_path, capsys):
    """argparse-level smoke for the small CLI mains: get_flops,
    misc/print_config, yunet2cpp (reference tools of the same names)."""
    import sys, os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(root, "tools"))
    sys.path.insert(0, os.path.join(root, "tools", "misc"))

    import get_flops
    get_flops.main(["yunet_n"])
    out = capsys.readouterr().out
    assert "149" in out and "75,856" in out

    import print_config
    print_config.main(["yunet_s", "--cfg-options", "train.lr=0.02"])
    out = capsys.readouterr().out
    assert '"lr": 0.02' in out and "yunet_s" in out

    import yunet2cpp
    dst = tmp_path / "facedetectcnn-data.cpp"
    yunet2cpp.main(["yunet_n", yunet_n_pth, "--output-file", str(dst),
                    "--no-summary"])
    src = dst.read_text()
    assert "ConvInfoStruct" in src and "float" in src


def test_profile_serve_cli_smoke(yunet_n_pth, tmp_path, capsys):
    """tools/misc/profile_serve.py end-to-end on CPU: builds the serve
    program, parses its HLO, traces a dispatch, prints the category
    table (interpret-mode Pallas; tiny batch to keep it fast)."""
    import sys, os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(root, "tools", "misc"))
    sys.path.insert(0, root)

    import profile_serve
    profile_serve.main(["--batch", "2", "--iters", "1",
                        "--out", str(tmp_path / "trace")])
    out = capsys.readouterr().out
    assert "by category" in out or "no trace found" in out
    assert "device total" in out or "no trace found" in out


@pytest.mark.slow
def test_bench_watchdog_early_trigger_and_suppression():
    """The bench watchdog guarantees a BENCH record: if the first device
    op never completes (dead tunnel) it emits the partial JSON at the
    short fuse and exits 3; once the device has answered (alive flag)
    only the long fuse remains."""
    import json
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def code(alive, sleep_s):
        return (
            "import sys, time\n"
            f"sys.path.insert(0, {root!r})\n"
            "import bench\n"
            "extra, errors, fps = {'partial': 1}, {}, [0.0]\n"
            f"alive = [{alive}]\n"
            "bench._arm_watchdog(extra, errors, fps, deadline_s=3600,\n"
            "                    alive=alive, first_op_deadline_s=30)\n"
            f"time.sleep({sleep_s})\n"
            "print('NO_FIRE')\n")

    r = subprocess.run(
        [sys.executable, "-c", code("False", 120)],
        capture_output=True, text=True, timeout=170)
    assert r.returncode == 3
    rec = json.loads(
        [l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    assert rec["extra"]["partial"] == 1
    assert "device_dead" in rec["extra"]["errors"]

    r2 = subprocess.run(
        [sys.executable, "-c", code("True", 70)],
        capture_output=True, text=True, timeout=170)
    assert r2.returncode == 0 and "NO_FIRE" in r2.stdout


def test_validate_config_rejects_parked_flags():
    """Measured-and-parked experimental combinations must not slip into a
    production run silently (round-4 VERDICT weak #7): fused training
    kernels and remat are gated behind force_experimental; hard
    inconsistencies (sharded bank without device_aug, non-dividing
    GhostBN group) are always errors."""
    from yunet_tpu.config import validate_config

    cfg = yunet_n()
    assert validate_config(cfg) is cfg  # shipped preset = every winner

    bad = apply_overrides(cfg, ["train.fused_kernels=true"])
    with pytest.raises(ValueError, match="fused_kernels"):
        validate_config(bad)
    validate_config(bad, force_experimental=True)  # explicit opt-in

    bad = apply_overrides(cfg, ["model.remat_stages=[0,1]"])
    with pytest.raises(ValueError, match="remat_stages"):
        validate_config(bad)
    validate_config(bad, force_experimental=True)

    with pytest.raises(ValueError, match="bank_sharded"):
        validate_config(apply_overrides(cfg, ["data.bank_sharded=true"]))
    with pytest.raises(ValueError, match="bn_group"):
        validate_config(apply_overrides(
            cfg, ["train.bn_group=5"]))  # 5 does not divide 16
    # bn_group=16 == samples_per_device: valid (one group, plain BN)
    validate_config(apply_overrides(cfg, ["train.bn_group=16"]))
