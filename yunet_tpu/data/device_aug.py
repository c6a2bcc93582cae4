"""HBM-staged dataset with on-device augmentation (MXU resampling).

TPU-first redesign of the training input pipeline for hosts where CPU
and/or host->device bandwidth cannot feed the chip (the reference binds
aug to host cv2 + PCIe per step, datasets/pipelines/transforms.py:975-1169
+ torch DataLoader). Here the decoded dataset is staged into device HBM
ONCE, and the per-step pipeline is:

  host   : crop geometry (RandomSquareCrop placement retries against the
           annotation boxes only) + GT transforms — a few hundred ns of
           numpy per sample, a ~10 KB wire payload per sample
  device : gather source images from the bank and apply
           crop+resize+flip as two batched interpolation matmuls on the
           MXU (bilinear resampling expressed as out = My @ img @ Mx^T),
           with the out-of-image region blending to gray 128 exactly like
           the reference's padded canvas (transforms.py:1140-1155)

Bilinear convention matches cv2.resize (src = (dst+0.5)*scale - 0.5), so
for a crop fully inside the image the result equals the host pipeline's
canvas-paste + cv2.resize up to interpolation arithmetic (cv2 quantizes
weights to 5 bits; the MXU accumulates bf16*bf16 in f32).

Staging resizes each image so its short side == bank_size (long side
capped by the canvas), mirroring the repo's reduced-decode approximation
(data/cache.py): crops are resampled from a bounded-resolution source
instead of the original. Per-chip HBM cost is N * canvas^2 * 3 bytes;
for multi-chip SPMD the bank is sharded over 'dp' and every chip samples
from its local shard (shard-disjoint sampling, the
DistributedGroupSampler role).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .dataset import SampleSpec
from .labelv2 import NK, Record, parse_labelv2
from .transforms import KPS_FLIP_ORDER, _centers_in_patch


class ImageBank:
    """Decode the dataset once into a fixed-canvas uint8 array.

    images[i]: short side resized to ``bank_size`` (or long side capped at
    ``canvas``), pasted top-left into a (canvas, canvas, 3) gray-128
    field. ``dims[i] = (h, w)`` is the valid region; ``ratios[i]`` maps
    original -> bank coordinates.
    """

    def __init__(self, records: List[Record], img_prefix: str, *,
                 bank_size: int = 640, canvas: int = 1152,
                 shard_index: int = 0, shard_count: int = 1):
        import cv2
        import os

        self.bank_size = bank_size
        self.canvas = canvas
        self.shard_index = shard_index
        self.shard_count = shard_count
        # contiguous shard of the record list (shard-disjoint sampling)
        self.records = records[shard_index::shard_count]
        n = len(self.records)
        self.images = np.full((n, canvas, canvas, 3), 128, np.uint8)
        self.dims = np.zeros((n, 2), np.int32)
        self.ratios = np.zeros((n,), np.float32)
        for i, rec in enumerate(self.records):
            img = cv2.imread(os.path.join(img_prefix, rec.filename),
                             cv2.IMREAD_COLOR)
            if img is None:
                raise FileNotFoundError(rec.filename)
            h, w = img.shape[:2]
            r = bank_size / min(h, w)
            if round(max(h, w) * r) > canvas:
                r = canvas / max(h, w)
            bh, bw = max(int(round(h * r)), 1), max(int(round(w * r)), 1)
            if (bh, bw) != (h, w):
                img = cv2.resize(img, (bw, bh),
                                 interpolation=cv2.INTER_AREA)
            self.images[i, :bh, :bw] = img
            self.dims[i] = (bh, bw)
            self.ratios[i] = r

    def __len__(self) -> int:
        return len(self.records)

    def _check_capacity(self, sharding, _stats=None) -> None:
        """Fail at staging time, with arithmetic, if the bank cannot fit.

        Without this, a too-large bank surfaces as a raw backend OOM deep
        inside device_put. Real WIDER train is 12,880 images x 1152^2 x 3 B
        ~= 51 GB — far beyond one 16 GB v5e chip — so the replicated
        default MUST be rejected early with the actionable alternatives
        (the DistributedGroupSampler-style shard-disjoint role,
        reference mmdet/datasets/samplers/group_sampler.py:51+).
        """
        import jax

        per_dev = self.images.nbytes
        if sharding is not None:
            if sharding.is_fully_addressable:
                shard_shape = sharding.shard_shape(self.images.shape)
                per_dev = int(np.prod(shard_shape)) * self.images.itemsize
            else:
                # multi-process: self.images is this process's local block,
                # spread over this process's addressable devices
                per_dev = self.images.nbytes // max(
                    1, len(sharding.addressable_devices))
        if _stats is not None:
            stats = _stats
        else:
            try:
                stats = jax.local_devices()[0].memory_stats() or {}
            except Exception:
                stats = {}
        limit = stats.get("bytes_limit")
        if not limit:
            return  # backend exposes no HBM accounting (CPU) — can't check
        free = limit - stats.get("bytes_in_use", 0)
        # leave headroom for params/activations/XLA scratch: the staged
        # bank may take at most 80% of currently-free device memory
        budget = int(free * 0.8)
        if per_dev <= budget:
            return
        n_dev = getattr(sharding, "num_devices", None) or 1
        sharded = per_dev < self.images.nbytes
        raise RuntimeError(
            f"image bank needs {per_dev / 1e9:.2f} GB per device "
            f"({len(self.images)} images x {self.canvas}^2 x 3 B"
            f"{f' over {n_dev} device shards' if sharded else ''}) but only "
            f"{free / 1e9:.2f} GB of {limit / 1e9:.2f} GB HBM is free "
            f"(budget {budget / 1e9:.2f} GB with scratch headroom). "
            "Options: (a) data.bank_sharded=true shards the bank over the "
            "'dp' mesh axis with shard-local sampling — an N-device slice "
            "divides the per-chip cost by N (real WIDER train at "
            "12,880 x 1152^2 x 3 B ~= 51 GB fits from 8 x 16 GB chips "
            "up); (b) reduce data.bank_canvas / data.bank_size; (c) "
            "data.device_aug=false falls back to the host cv2 pipeline "
            "(no HBM cost, needs host decode + wire bandwidth)."
        )

    def to_device(self, sharding=None, chunk_mb: int = 96, fmt=None):
        """Stage the bank into HBM (chunked puts: a single multi-GB RPC
        stalls some transports). Returns a device array.

        fmt: an optional jax.experimental.layout.Format to stage INTO
        (the train step's preferred bank operand layout, probed by
        train/step.py probe_bank_step). Staging directly in the
        consumer's layout removes the full-bank relayout copy XLA
        otherwise inserts inside the step — which both doubles staging
        HBM (OOM at 10.9 GB on a 15.75 GB chip) and taxes every step
        (the round-4 roofline's layout_copies line).

        With a non-fully-addressable sharding (multi-process mesh) the
        global array is assembled from this process's local block via
        jax.make_array_from_process_local_data."""
        import jax
        import jax.numpy as jnp

        self._check_capacity(sharding)
        if sharding is not None and not sharding.is_fully_addressable:
            return jax.make_array_from_process_local_data(
                sharding, self.images)
        per_img = self.images[0].nbytes
        step = max(chunk_mb * (1 << 20) // per_img, 1)
        if fmt is not None:
            # allocate the bank in the target layout, then write each
            # staged chunk into it (donated: in-place): peak HBM =
            # bank + one chunk, and the result needs no further copy
            import functools

            @functools.partial(jax.jit, out_shardings=fmt)
            def _alloc():
                return jnp.zeros(self.images.shape, self.images.dtype)

            @functools.partial(jax.jit, donate_argnums=(0,),
                               in_shardings=(fmt, None, None),
                               out_shardings=fmt)
            def _write_fmt(bank, chunk, at):
                return jax.lax.dynamic_update_slice_in_dim(
                    bank, chunk, at, axis=0)

            want = fmt.layout.major_to_minor
            bank = _alloc()
            # Verify the layout BEFORE the multi-minute chunk loop: an
            # AOT-compiled consumer REJECTS (rather than
            # relayout-copies) a mismatched bank, and the in-step
            # relayout the probe exists to avoid OOMs at XL scale — so
            # a silent layout fallback here (observed with the
            # persistent compile cache enabled: staged (1,3,2,0)
            # despite out_shardings (0,3,1,2), reproduced 4x, round-5
            # XL rehearsal; correct with YUNET_NO_COMPILE_CACHE=1) must
            # be caught NOW.
            got = bank.format.layout.major_to_minor
            if got == want:
                for i in range(0, len(self.images), step):
                    chunk = jax.device_put(self.images[i:i + step])
                    bank = _write_fmt(bank, chunk, jnp.int32(i))
                    del chunk
                got = bank.format.layout.major_to_minor
            if got == want:
                return bank
            import logging
            logging.getLogger("yunet_tpu").warning(
                f"staged bank layout {got} != requested {want}; "
                "falling back to a whole-array device_put into the "
                "target Format (peak HBM = one bank; a single large "
                "RPC on tunnel transports)")
            del bank
            bank = jax.device_put(self.images, fmt)
            got = bank.format.layout.major_to_minor
            if got != want:
                raise RuntimeError(
                    f"bank staging produced layout {got} via both the "
                    f"donated-write path and device_put(Format), but "
                    f"the compiled train step requires {want}; re-run "
                    "(the backend may need a fresh process), or set "
                    "data.device_aug=false to use the host pipeline")
            return bank
        if step >= len(self.images):
            bank = jax.device_put(self.images)
        else:
            # Write each staged chunk into a donated preallocated bank:
            # peak HBM = bank + one chunk. The previous
            # concatenate(parts) materialized all parts AND the result
            # simultaneously (2x bank + temps) — a 10.9 GB bank OOMed a
            # 15.75 GB chip at staging while fitting fine at steady
            # state (round-5 XL rehearsal, docs/rehearsal_r05/).
            import functools

            @functools.partial(jax.jit, donate_argnums=(0,))
            def _write(bank, chunk, at):
                return jax.lax.dynamic_update_slice_in_dim(
                    bank, chunk, at, axis=0)

            bank = jnp.zeros(self.images.shape, self.images.dtype)
            for i in range(0, len(self.images), step):
                chunk = jax.device_put(self.images[i:i + step])
                bank = _write(bank, chunk, jnp.int32(i))
                del chunk
        if sharding is not None:
            bank = jax.device_put(bank, sharding)
        return bank


def sample_crop_geometry(bank_h: int, bank_w: int, boxes: np.ndarray,
                         crop_choice: Sequence[float],
                         rng: np.random.RandomState, *,
                         scale: Optional[float] = None
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """RandomSquareCrop placement (reference transforms.py:1047-1098)
    against the boxes only — no pixels touched. Returns (patch, keep_mask)
    in bank coordinates."""
    short_side = min(bank_h, bank_w)
    max_scale = max(crop_choice)
    if scale is None:
        scale = float(rng.choice(crop_choice))
    first = True
    while True:
        if not first and max_scale <= 1.0:
            scale = scale * 1.2
        elif not first:
            scale = float(rng.choice(crop_choice))
        first = False
        for _ in range(250):
            cw = int(scale * short_side)
            left = 0 if bank_w == cw else (
                rng.randint(0, bank_w - cw + 1) if bank_w > cw
                else rng.randint(bank_w - cw, 1))
            top = 0 if bank_h == cw else (
                rng.randint(0, bank_h - cw + 1) if bank_h > cw
                else rng.randint(bank_h - cw, 1))
            patch = np.asarray([left, top, left + cw, top + cw], np.int64)
            mask = _centers_in_patch(boxes, patch)
            if mask.any():
                return patch, mask


def make_aug_sample(bank: ImageBank, local_idx: int,
                    rng: np.random.RandomState, spec: SampleSpec,
                    wire_gts: Optional[int] = None
                    ) -> Dict[str, np.ndarray]:
    """One sample's geometry + transformed GTs (host side).

    Mirrors WiderFaceDataset.get_train_sample's crop/resize/flip target
    math (data/dataset.py:71-112) with the pixel work deferred to
    device_resample. ``wire_gts`` caps the padded GT slots actually sent
    over the wire (the step re-pads to cfg.data.max_gts on device)."""
    rec = bank.records[local_idx]
    bh, bw = bank.dims[local_idx]
    r = bank.ratios[local_idx]
    boxes = rec.bboxes * r
    kps = rec.kps.copy()
    kps[:, :, 0] *= r
    kps[:, :, 1] *= r

    patch, mask = sample_crop_geometry(
        int(bh), int(bw), boxes, spec.crop_choice, rng)
    p = patch.astype(np.float32)
    boxes = boxes[mask]
    boxes = np.concatenate([np.maximum(boxes[:, :2], p[:2]),
                            np.minimum(boxes[:, 2:], p[2:])], 1)
    boxes -= np.tile(p[:2], 2)
    kps = kps[mask]
    kps[:, :, 0] = np.clip(kps[:, :, 0], p[0], p[2]) - p[0]
    kps[:, :, 1] = np.clip(kps[:, :, 1], p[1], p[3]) - p[1]

    out = float(spec.img_size)
    side = float(patch[2] - patch[0])
    f = out / side
    boxes = boxes * f
    kps[:, :, :2] *= f

    flip = bool(rng.uniform() < spec.flip_ratio)
    if flip:
        b = boxes.copy()
        b[:, 0] = out - boxes[:, 2]
        b[:, 2] = out - boxes[:, 0]
        boxes = b
        kps = kps[:, KPS_FLIP_ORDER, :].copy()
        kps[:, :, 0] = out - kps[:, :, 0]

    g = spec.max_gts if wire_gts is None else min(wire_gts, spec.max_gts)
    n = boxes.shape[0]
    if n > g:
        area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        keep = np.argsort(-area, kind="stable")[:g]
        boxes, kps = boxes[keep], kps[keep]
        overflow = n - g
        n = g
    else:
        overflow = 0
    out_boxes = np.zeros((g, 4), np.float32)
    out_kps = np.zeros((g, NK, 3), np.float32)
    out_boxes[:n] = boxes
    out_kps[:n] = kps
    return {
        "aug_idx": np.int32(local_idx),
        "aug_y0": np.float32(patch[1]),
        "aug_x0": np.float32(patch[0]),
        "aug_side": np.float32(side),
        "aug_flip": np.bool_(flip),
        "gt_bboxes": out_boxes,
        "gt_labels": np.zeros((g,), np.int32),
        "gt_kps": out_kps,
        "gt_valid": (np.arange(g) < n),
        "num_overflow": np.int32(overflow),
    }


def device_resample(bank, idx, y0, x0, side, flip, *, out_size: int,
                    dtype=None, max_scale: Optional[float] = None,
                    tile: Optional[int] = None):
    """Batched crop+bilinear-resize+flip from the HBM bank — two
    interpolation matmuls per sample on the MXU.

    out[b,i,j,c] = sum_{k,l} My[b,i,k] Mx[b,j,l] bank[idx[b],k,l,c]
                   + 128 * (1 - cy[b,i] * cx[b,j])

    The tent weights follow cv2.resize's convention
    (src = (dst+0.5)*side/out - 0.5); taps outside the canvas contribute
    nothing and the uncovered fraction blends to gray 128, which equals
    the reference's 128-padded crop canvas under bilinear resize
    (transforms.py:1140-1155). Returns f32 (or ``dtype``) in 0..255.

    ``max_scale``: upper bound on side/out_size (= max(crop_choice) by
    construction of sample_crop_geometry). When given, the y-stage runs
    ROW-TILED: a bilinear tent row has only 2 non-zero taps, so a tile
    of ``tile`` consecutive output rows touches at most
    (tile-1)*max_scale+2 consecutive source rows. Slicing just that
    strip per (sample, tile) straight out of the bank fuses away the
    separate bank[idx] full-image gather (a ~3 ms serial loop at
    b128/1152²) and shrinks the y-matmul contraction from the canvas
    height to the strip (~9x fewer MXU FLOPs): 18.8 -> 13.1 ms for a
    128x640² batch (tools/misc/bench_resample.py, interleaved). The
    surviving tent taps are unchanged — bit-exact vs the dense path in
    bf16 (tap products are exactly representable in the f32
    accumulator); in f32, FMA re-blocking of the shorter contraction
    gives ~1-ulp differences, and on TPU fusion-dependent rounding
    differs by at most 0.5 of 255 — all far inside the cv2-parity
    band the host pipeline itself carries.
    """
    import jax
    import jax.numpy as jnp

    mat_dtype = dtype if dtype is not None else jnp.float32
    h = bank.shape[1]
    w = bank.shape[2]
    scale = (side / out_size)[:, None]
    o = jnp.arange(out_size, dtype=jnp.float32)
    src_y = y0[:, None] + (o + 0.5) * scale - 0.5          # (B, out)
    ox = jnp.where(flip[:, None], out_size - 1 - o, o)
    src_x = x0[:, None] + (ox + 0.5) * scale - 0.5

    strip = 0
    if max_scale is not None and tile is None:
        # measured sweet spot at b128/640²: 320-row tiles beat 64
        # (serial slice-loop overhead) and 640 (strip ≈ full canvas);
        # pick the largest divisor of out_size ≤ 320
        tile = next(t for t in range(min(320, out_size), 0, -1)
                    if out_size % t == 0)
    if max_scale is not None and out_size % tile == 0:
        strip = int((tile - 1) * max_scale) + 3   # floor(max)+1-floor(min)+1
        strip = -(-strip // 8) * 8
    if 0 < strip < h:
        n_tiles = out_size // tile
        src_y_t = src_y.reshape(-1, n_tiles, tile)         # (B, T, tile)
        # src_y is increasing in i (scale > 0), so the tile minimum is
        # its first element; clamping keeps the strip inside the canvas
        # (taps the clamp excludes lie outside [0, h) and are absent
        # from the dense formulation too)
        start = jnp.clip(jnp.floor(src_y_t[:, :, 0]).astype(jnp.int32),
                         0, h - strip)                     # (B, T)
        rows = start[:, :, None].astype(jnp.float32) + \
            jnp.arange(strip, dtype=jnp.float32)           # (B, T, strip)
        my = jnp.maximum(0.0, 1.0 - jnp.abs(src_y_t[..., None]
                                            - rows[:, :, None, :]))
        cy = my.sum(-1).reshape(-1, out_size)              # f32 coverage

        def _slice(i, s):
            return jax.lax.dynamic_slice(
                bank, (i, s, 0, 0), (1, strip, w, 3))[0]

        strips = jax.vmap(jax.vmap(_slice, in_axes=(None, 0)),
                          in_axes=(0, 0))(idx, start)      # (B,T,strip,w,3)
        tmp = jnp.einsum("btik,btkwc->btiwc", my.astype(mat_dtype),
                         strips.astype(mat_dtype),
                         preferred_element_type=jnp.float32)
        tmp = tmp.reshape(-1, out_size, w, 3)
    else:
        imgs = bank[idx].astype(mat_dtype)                 # (B, H, W, 3)
        ky = jnp.arange(h, dtype=jnp.float32)
        my = jnp.maximum(0.0, 1.0 - jnp.abs(src_y[:, :, None] - ky))
        cy = my.sum(-1)                                    # f32 coverage
        tmp = jnp.einsum("bih,bhwc->biwc", my.astype(mat_dtype), imgs,
                         preferred_element_type=jnp.float32)

    kx = jnp.arange(w, dtype=jnp.float32)
    mx = jnp.maximum(0.0, 1.0 - jnp.abs(src_x[:, :, None] - kx))
    cx = mx.sum(-1)
    out = jnp.einsum("bjw,biwc->bijc", mx.astype(mat_dtype),
                     tmp.astype(mat_dtype),
                     preferred_element_type=jnp.float32)
    out = out + 128.0 * (1.0 - cy[:, :, None] * cx[:, None, :])[..., None]
    return out if dtype is None else out.astype(dtype)


AUG_KEYS = ("aug_idx", "aug_y0", "aug_x0", "aug_side", "aug_flip")


class DeviceAugLoader:
    """TrainLoader-shaped iterator yielding geometry+GT batches (no image
    pixels). Same epoch-shuffle / per-sample-seed / resume contract as
    TrainLoader (data/loader.py:91-133); host work is light enough that
    no worker pool is needed.

    device_shards > 1 enables the SHARDED-bank mode for datasets too
    large to replicate per chip: this host's records are split into
    ``device_shards`` equal sub-shards (one per local device), batch slot
    j samples from sub-shard j // (batch/device_shards) and carries a
    SUB-SHARD-LOCAL index. The bank array concatenates the sub-shards in
    order, so staging it with a P('dp')-sharded dim 0 puts exactly
    sub-shard d into device d's HBM, and inside shard_map ``bank[idx]``
    reads only local memory — shard-disjoint sampling, the
    DistributedGroupSampler role (reference samplers/group_sampler.py:51+)
    with the dataset itself resident on the chips."""

    def __init__(self, ann_file: str, img_prefix: str, *,
                 batch_size: int, spec: SampleSpec, seed: int = 0,
                 min_size: Optional[float] = None,
                 process_index: int = 0, process_count: int = 1,
                 prefetch: int = 2, start_step: int = 0,
                 bank_size: int = 640, bank_canvas: int = 1152,
                 device_shards: int = 1):
        records = parse_labelv2(ann_file, min_size=min_size)
        if process_count > 1:
            # multi-process banks are always mesh-sharded (a "replicated"
            # bank would be inconsistent across hosts — each host only
            # decodes its own records); shard sizes must be globally
            # uniform for the P('dp') layout, so truncate first
            per = len(records) // (process_count * max(device_shards, 1))
            if per == 0:
                raise ValueError("fewer images than process*device shards")
            records = records[:per * process_count * max(device_shards, 1)]
        self.bank = ImageBank(records, img_prefix, bank_size=bank_size,
                              canvas=bank_canvas,
                              shard_index=process_index,
                              shard_count=process_count)
        self.device_shards = device_shards
        n = len(self.bank)
        if device_shards > 1:
            if batch_size % device_shards:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by "
                    f"device_shards {device_shards}")
            # equal sub-shards (truncate the tail so the bank array
            # splits evenly over the mesh axis)
            per = n // device_shards
            if per == 0:
                raise ValueError("fewer images than device shards")
            keep = per * device_shards
            self.bank.records = self.bank.records[:keep]
            self.bank.images = self.bank.images[:keep]
            self.bank.dims = self.bank.dims[:keep]
            self.bank.ratios = self.bank.ratios[:keep]
            self.shard_len = per
        else:
            self.shard_len = n
        self.batch_size = batch_size
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self.spec = spec
        # wire payload: pad GTs only to what this shard can produce
        # (rounded up); the device step re-pads to spec.max_gts
        max_faces = max((len(r.bboxes) for r in self.bank.records),
                        default=1)
        self.wire_gts = min(spec.max_gts, max(8, -(-max_faces // 8) * 8))
        self._start_step = start_step
        self._queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    @property
    def steps_per_epoch(self) -> int:
        if self.device_shards > 1:
            sub = self.batch_size // self.device_shards
            return max(self.shard_len // sub, 1)
        return max(len(self.bank) // self.batch_size, 1)

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        """(steps, batch) of GLOBAL record indices for this epoch.

        Sharded mode: batch slot j draws from sub-shard
        j // (batch/device_shards), each sub-shard independently
        epoch-permuted (shard-disjoint sampling)."""
        rng = np.random.RandomState(self.seed + epoch)
        if self.device_shards > 1:
            sub = self.batch_size // self.device_shards
            steps = self.steps_per_epoch
            cols = []
            for s in range(self.device_shards):
                perm = rng.permutation(self.shard_len)[:steps * sub]
                cols.append(perm.reshape(steps, sub) + s * self.shard_len)
            return np.concatenate(cols, axis=1)
        idx = rng.permutation(len(self.bank))
        usable = (len(idx) // self.batch_size) * self.batch_size
        return idx[:usable].reshape(-1, self.batch_size)

    def _producer(self):
        from .dataset import pack_batch

        epoch = self._start_step // self.steps_per_epoch
        skip = self._start_step % self.steps_per_epoch
        step_global = self._start_step
        while not self._stop.is_set():
            batches = self._epoch_indices(epoch)
            if skip:
                batches = batches[skip:]
                skip = 0
            for batch_idx in batches:
                off = self.process_index * self.batch_size
                samples = []
                for j, i in enumerate(batch_idx):
                    # mod 2^32: numpy seeds are bounded, and the stride
                    # overflows past step ~4294 (found by the 9472-step
                    # recipe A/B run)
                    rng = np.random.RandomState(
                        (self.seed + 1000003 * step_global + off + j)
                        % (2 ** 32))
                    s = make_aug_sample(
                        self.bank, int(i), rng, self.spec,
                        wire_gts=self.wire_gts)
                    if self.device_shards > 1:
                        # wire index is SUB-SHARD-LOCAL: inside shard_map
                        # each device gathers from its own bank shard
                        s["aug_idx"] = np.int32(int(i) % self.shard_len)
                    samples.append(s)
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
