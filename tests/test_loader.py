"""TrainLoader integration: real files on disk, epoch shuffling,
multi-host shard disjointness, prefetch."""

import os

import numpy as np
import pytest

from yunet_tpu.data.dataset import SampleSpec
from yunet_tpu.data.loader import TrainLoader, device_prefetch


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("widerface")
    img_dir = root / "images" / "0--Ev"
    os.makedirs(img_dir)
    rng = np.random.RandomState(0)
    lines = []
    for i in range(8):
        h, w = rng.randint(80, 160), rng.randint(80, 160)
        img = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"im{i}.jpg"), img)
        lines.append(f"# 0--Ev/im{i}.jpg {w} {h}")
        for _ in range(rng.randint(1, 4)):
            x1, y1 = rng.randint(5, w // 2), rng.randint(5, h // 2)
            bw, bh = rng.randint(10, 30), rng.randint(10, 30)
            kps = " ".join(
                f"{x1 + rng.randint(bw)} {y1 + rng.randint(bh)} 1.0"
                for _ in range(5))
            lines.append(f"{x1} {y1} {min(x1 + bw, w - 1)} "
                         f"{min(y1 + bh, h - 1)} {kps}")
    ann = root / "labelv2.txt"
    ann.write_text("\n".join(lines) + "\n")
    return str(ann), str(root / "images")


def test_loader_batches(tiny_dataset):
    ann, prefix = tiny_dataset
    spec = SampleSpec(img_size=96, max_gts=8, crop_choice=(0.5, 1.0),
                      flip_ratio=0.5)
    loader = TrainLoader(ann, prefix, batch_size=4, spec=spec,
                         num_workers=0, seed=0)
    it = iter(loader)
    b1 = next(it)
    b2 = next(it)
    assert b1["image"].shape == (4, 96, 96, 3)
    assert b1["gt_bboxes"].shape == (4, 8, 4)
    assert b1["gt_valid"].any()
    assert b1["gt_kps"].shape == (4, 8, 5, 3)
    # crops always contain >= 1 GT
    assert (b1["gt_valid"].sum(1) >= 1).all()
    # different steps see different data
    assert not np.array_equal(b1["image"], b2["image"])
    loader.close()


def test_loader_deterministic_given_seed(tiny_dataset):
    ann, prefix = tiny_dataset
    spec = SampleSpec(img_size=96, max_gts=8, crop_choice=(0.5,),
                      flip_ratio=0.5)

    def first_batch(seed):
        loader = TrainLoader(ann, prefix, batch_size=4, spec=spec,
                             num_workers=0, seed=seed)
        b = next(iter(loader))
        loader.close()
        return b

    a = first_batch(7)
    b = first_batch(7)
    c = first_batch(8)
    np.testing.assert_array_equal(a["image"], b["image"])
    assert not np.array_equal(a["image"], c["image"])


def test_loader_multiprocess_workers(tiny_dataset):
    ann, prefix = tiny_dataset
    spec = SampleSpec(img_size=96, max_gts=8, crop_choice=(0.5, 1.0),
                      flip_ratio=0.5)
    loader = TrainLoader(ann, prefix, batch_size=4, spec=spec,
                         num_workers=2, seed=0)
    b = next(iter(loader))
    assert b["image"].shape == (4, 96, 96, 3)
    assert np.isfinite(b["image"]).all()
    loader.close()


def test_epoch_indices_shard_disjoint(tiny_dataset):
    ann, prefix = tiny_dataset
    spec = SampleSpec(img_size=96, max_gts=8)
    shards = []
    for pi in range(2):
        loader = TrainLoader(ann, prefix, batch_size=2, spec=spec,
                             num_workers=0, seed=0, process_index=pi,
                             process_count=2)
        shards.append(loader._epoch_indices(0))
        loader.close()
    a, b = shards
    assert a.shape == b.shape
    # per-host shards are disjoint and cover distinct samples per step
    for step in range(a.shape[0]):
        assert not set(a[step]) & set(b[step])


def test_loader_resume_continues_stream(tiny_dataset):
    """start_step=k reproduces exactly the batches a fresh loader would
    emit from step k (epoch offset + per-sample seed continuity)."""
    ann, prefix = tiny_dataset
    spec = SampleSpec(img_size=96, max_gts=8, crop_choice=(0.5,),
                      flip_ratio=0.5)
    a = TrainLoader(ann, prefix, batch_size=4, spec=spec, num_workers=0,
                    seed=1)
    it = iter(a)
    stream = [next(it) for _ in range(5)]
    a.close()
    b = TrainLoader(ann, prefix, batch_size=4, spec=spec, num_workers=0,
                    seed=1, start_step=3)
    itb = iter(b)
    resumed = [next(itb) for _ in range(2)]
    b.close()
    np.testing.assert_array_equal(stream[3]["image"], resumed[0]["image"])
    np.testing.assert_array_equal(stream[4]["image"], resumed[1]["image"])


def test_device_prefetch_order():
    src = [{"x": np.full((2,), i, np.float32)} for i in range(5)]
    out = list(device_prefetch(iter(src), depth=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_allclose(np.asarray(b["x"]), i)
