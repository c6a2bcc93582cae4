"""Multi-process training input pipeline with device prefetch.

Fills the role of the reference's torch DataLoader + DistributedGroupSampler
(datasets/builder.py:94-206, samplers/group_sampler.py) with a design shaped
for TPU SPMD:

  * a worker *process* pool decodes+augments images (cv2 work is the
    bottleneck; processes sidestep the GIL),
  * per-epoch deterministic shuffling from a seed (epoch-seeded like
    DistributedGroupSampler, :95-103), with per-sample RandomState streams
    so results are independent of worker scheduling,
  * each host pulls only its own shard of the global batch (SPMD
    per-host feeding), and batches are staged onto device asynchronously
    (double-buffering via jax.device_put while the step runs).

Aspect-ratio grouped batching is intentionally dropped: RandomSquareCrop +
fixed 640x640 resize makes every training sample the same shape, so
grouping buys nothing (it exists in the reference because mmdet pads
variable shapes).
"""

from __future__ import annotations

import multiprocessing as mp
import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from .dataset import SampleSpec, WiderFaceDataset, pack_batch

_worker_dataset: Optional[WiderFaceDataset] = None


def _worker_init(ann_file, img_prefix, spec, min_size,
                 decoded_cache=None, reduced_decode=False):
    global _worker_dataset
    import cv2
    cv2.setNumThreads(0)  # one process = one stream of cv2 work
    _worker_dataset = WiderFaceDataset(
        ann_file, img_prefix, spec, min_size=min_size,
        decoded_cache=decoded_cache, reduced_decode=reduced_decode)


def _worker_sample(args):
    idx, seed = args
    rng = np.random.RandomState(seed)
    return _worker_dataset.get_train_sample(idx, rng)


class TrainLoader:
    """Infinite epoch-shuffled loader yielding fixed-shape host batches."""

    def __init__(self, ann_file: str, img_prefix: str, *,
                 batch_size: int, spec: SampleSpec,
                 num_workers: int = 4, seed: int = 0,
                 min_size: Optional[float] = None,
                 process_index: int = 0, process_count: int = 1,
                 prefetch: int = 2, start_step: int = 0,
                 decoded_cache: Optional[str] = None,
                 reduced_decode: bool = False):
        self.dataset = WiderFaceDataset(
            ann_file, img_prefix, spec, min_size=min_size,
            decoded_cache=decoded_cache, reduced_decode=reduced_decode)
        self.batch_size = batch_size          # per-host batch
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self.spec = spec
        self._pool = None
        init_args = (ann_file, img_prefix, spec, min_size,
                     decoded_cache, reduced_decode)
        if num_workers > 0:
            ctx = mp.get_context("fork")
            self._pool = ctx.Pool(
                num_workers, initializer=_worker_init, initargs=init_args)
        else:
            _worker_init(*init_args)
        self._start_step = start_step
        self._queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    @property
    def steps_per_epoch(self) -> int:
        global_batch = self.batch_size * self.process_count
        return max(len(self.dataset) // global_batch, 1)

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        rng = np.random.RandomState(self.seed + epoch)
        idx = rng.permutation(len(self.dataset))
        global_batch = self.batch_size * self.process_count
        usable = (len(idx) // global_batch) * global_batch
        idx = idx[:usable].reshape(-1, self.process_count, self.batch_size)
        return idx[:, self.process_index, :]  # (steps, per-host batch)

    def _producer(self):
        # resume mid-training at the right epoch/step (the DataLoader
        # counterpart of DistSamplerSeedHook's epoch-seeded reshuffle)
        epoch = self._start_step // self.steps_per_epoch
        skip = self._start_step % self.steps_per_epoch
        step_global = self._start_step
        while not self._stop.is_set():
            batches = self._epoch_indices(epoch)
            if skip:
                batches = batches[skip:]
                skip = 0
            for batch_idx in batches:
                # seed by GLOBAL batch position (process shard offset +
                # local slot) so multi-process hosts draw independent
                # augmentation streams; single-process streams are
                # unchanged (offset 0)
                off = self.process_index * self.batch_size
                # mod 2^32: numpy seeds are bounded and the stride
                # overflows past step ~4294
                seeds = [(int(i),
                          (self.seed + 1000003 * step_global + off + j)
                          % (2 ** 32))
                         for j, i in enumerate(batch_idx)]
                if self._pool is not None:
                    samples = self._pool.map(_worker_sample, seeds)
                else:
                    samples = [_worker_sample(s) for s in seeds]
                batch = pack_batch(samples)
                step_global += 1
                while not self._stop.is_set():
                    try:
                        self._queue.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return
            epoch += 1

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        while True:
            yield self._queue.get()

    def close(self):
        self._stop.set()
        if self._pool is not None:
            self._pool.terminate()


def device_prefetch(iterator, *, sharding=None, depth: int = 2):
    """Stage host batches onto device ahead of consumption.

    The device_put runs on a staging thread: on transports where the put
    blocks for the transfer (tunneled devices), an inline put would
    serialize host->device traffic with the step dispatch loop; the
    thread overlaps it with device compute (jax releases the GIL during
    the transfer)."""
    import jax

    def _put(batch):
        if sharding is not None:
            if not sharding.is_fully_addressable:
                # multi-process mesh: each host holds only its shard of
                # the global batch — assemble the global array from the
                # per-process local data (the NCCL-free DDP equivalent)
                import numpy as np
                return jax.tree.map(
                    lambda a: jax.make_array_from_process_local_data(
                        sharding, np.asarray(a)), batch)
            return jax.device_put(batch, sharding)
        return jax.device_put(batch)

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()
    _END = object()

    def _stage():
        it = iter(iterator)
        while not stop.is_set():
            try:
                staged = _put(next(it))
            except StopIteration:
                q.put(_END)
                return
            while not stop.is_set():
                try:
                    q.put(staged, timeout=0.5)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=_stage, daemon=True)
    t.start()
    try:
        while True:
            out = q.get()
            if out is _END:
                return
            yield out
    finally:
        stop.set()
