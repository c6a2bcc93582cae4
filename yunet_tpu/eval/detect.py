"""Inference pipeline: preprocess -> jit forward+decode -> NMS -> rescale.

Covers the roles of the reference's simple_test stack
(detectors/yunet.py:53-80, yunet_head.py:291-416) and the detect CLI
preprocessing (tools/detect_image.py:99-132):

  * `resize_img` modes ORIGIN / AUTO (zero-pad H,W up to the next multiple
    of 32) / fixed "W,H" canvases with aspect-preserving resize;
  * one jitted program per padded input shape (shape-bucketed cache — the
    TPU answer to origin-size eval without per-image recompiles);
  * score fusion sigmoid(cls)*sigmoid(obj), decode, then either on-device
    fixed-K NMS (fast path) or exact host NMS via the native C++ kernel
    (AP-parity path, uncapped like the reference's max_per_img=-1).
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models.detector import YuNet
from ..ops.boxes import bbox_decode, kps_decode
from ..ops.nms_pallas import pallas_nms, pallas_nms_batched
from ..ops.priors import grid_priors
from .. import native


def canvas_shape(h: int, w: int, mode: Union[str, Tuple[int, int]],
                 divisor: int = 32) -> Tuple[int, int]:
    """(H, W) of the canvas resize_img will produce for an (h, w) image —
    the single source of truth for batching: images whose canvas_shape
    matches can stack into one detect_batch chunk."""
    if mode in ("ORIGIN", "AUTO"):
        return (-(-h // divisor) * divisor, -(-w // divisor) * divisor)
    if mode == "VGA":
        input_size = (640, 480)
    elif isinstance(mode, str):
        input_size = tuple(int(v) for v in mode.split(","))
    else:
        input_size = tuple(mode)
    x, y = max(input_size), min(input_size)
    # landscape fills the long side; portrait (and square) the short
    return (y, x) if w > h else (x, y)


def resize_img(img: np.ndarray, mode: Union[str, Tuple[int, int]],
               divisor: int = 32) -> Tuple[np.ndarray, float]:
    """Reference tools/detect_image.py:99-132 preprocessing modes.

    ``divisor`` controls the zero-pad granularity of ORIGIN/AUTO. The
    reference pads to /32; on TPU every distinct padded shape is a separate
    compiled program, so a larger divisor (e.g. 128/256) buckets the WIDER
    val origin-size sweep into far fewer compilations. Extra padding is
    zeros, which the score threshold rejects — AP-neutral in practice.
    """
    import cv2

    if mode in ("ORIGIN", "AUTO"):
        h, w = canvas_shape(img.shape[0], img.shape[1], mode, divisor)
        if (h, w) != img.shape[:2]:
            padded = np.zeros((h, w, 3), dtype=img.dtype)
            padded[:img.shape[0], :img.shape[1]] = img
            img = padded
        return img, 1.0
    ch, cw = canvas_shape(img.shape[0], img.shape[1], mode, divisor)
    input_size = (cw, ch)                    # resize_img works in (W, H)
    im_ratio = img.shape[0] / img.shape[1]
    model_ratio = input_size[1] / input_size[0]
    if im_ratio > model_ratio:
        new_h = input_size[1]
        new_w = int(new_h / im_ratio)
    else:
        new_w = input_size[0]
        new_h = int(new_w * im_ratio)
    det_scale = new_h / img.shape[0]
    resized = cv2.resize(img, (new_w, new_h))
    det_img = np.zeros((input_size[1], input_size[0], 3), dtype=img.dtype)
    det_img[:new_h, :new_w] = resized
    return det_img, det_scale


def bbox2result(bboxes: np.ndarray, labels: np.ndarray,
                num_classes: int) -> list:
    """Split (n, 5) detections into per-class numpy arrays
    (reference core/bbox/transforms.py bbox2result)."""
    if bboxes.shape[0] == 0:
        return [np.zeros((0, 5), np.float32)
                for _ in range(num_classes)]
    return [bboxes[labels == i] for i in range(num_classes)]


class Detector:
    """Stateful inference wrapper with a per-shape compiled-program cache."""

    def __init__(self, cfg: Config, params=None, state=None, *,
                 bf16: bool = True, fused: bool = False, folded=None):
        """Either (params, state) [+ fused=True to fold], or a pre-folded
        tree via ``folded`` (e.g. from export.onnx_import)."""
        self.cfg = cfg
        self.model = YuNet(cfg.model)
        self.params = jax.tree.map(jnp.asarray, params) \
            if params is not None else {}
        self.state = jax.tree.map(jnp.asarray, state) \
            if state is not None else {}
        self.bf16 = bf16
        self.fused = fused or folded is not None
        self._folded = folded
        if fused and folded is None:
            if params is None:
                raise ValueError("fused=True needs (params, state)")
            from ..models.fused import fold_inference_params
            self._folded = fold_inference_params(params, state, cfg.model)
        self._raw_cache: Dict[Tuple[int, int], object] = {}
        self._nms_cache: Dict[Tuple[int, int, int], object] = {}
        self._batch_cache: Dict[Tuple[int, int], object] = {}
        # optional device mesh: detect_batch shards batch rows over it
        # (data-parallel eval — the multi_gpu_test role)
        self.mesh = None
        # images whose device-NMS pre-NMS cap was saturated in the last
        # detect_batch(use_device_nms=True) call (see that docstring)
        self.last_devnms_saturated = 0

    # -- jitted programs ----------------------------------------------------
    def _raw_fn(self, h: int, w: int):
        """(1,H,W,3) -> (scores (P,), boxes (P,4), kps (P,2K)) f32."""
        if (h, w) in self._raw_cache:
            return self._raw_cache[(h, w)]
        sizes = self.model.featmap_sizes(h, w)
        priors = jnp.asarray(grid_priors(sizes, self.cfg.model.strides,
                                         self.cfg.model.prior_offset))

        def _forward(params, state, x):
            if self.fused:
                from ..models.fused import fused_forward
                from ..models.head import flatten_level_outputs
                outs = fused_forward(self._folded, x, self.cfg.model)
                return flatten_level_outputs(outs)
            flat, _ = self.model.forward_flat(params, state, x,
                                              train=False)
            return flat

        @jax.jit
        def fn(params, state, x):
            if self.bf16:
                x = x.astype(jnp.bfloat16)
            flat = _forward(params, state, x)
            cls = flat["cls"][0].astype(jnp.float32)
            obj = flat["obj"][0, :, 0].astype(jnp.float32)
            scores = (jax.nn.sigmoid(cls[:, 0]) * jax.nn.sigmoid(obj))
            boxes = bbox_decode(priors, flat["bbox"][0].astype(jnp.float32))
            kps = kps_decode(priors, flat["kps"][0].astype(jnp.float32))
            return scores, boxes, kps

        self._raw_cache[(h, w)] = fn
        return fn

    def _nms_fn(self, h: int, w: int, top_k: int):
        key = (h, w, top_k)
        if key in self._nms_cache:
            return self._nms_cache[key]
        raw = self._raw_fn(h, w)

        @jax.jit
        def fn(params, state, x):
            scores, boxes, kps = raw(params, state, x)
            dets, keep, idx = pallas_nms(
                boxes, scores, top_k=top_k,
                iou_thr=self.cfg.test.nms_iou_thr,
                score_thr=self.cfg.test.score_thr)
            # pack all three results into ONE buffer: each host
            # materialization pays a device round trip, and the b1
            # latency budget showed the extra readbacks dominating the
            # call (bench detect_b1_budget_ms)
            packed = jnp.concatenate(
                [dets, keep[:, None].astype(dets.dtype), kps[idx]],
                axis=-1)
            return packed

        self._nms_cache[key] = fn
        return fn

    # -- public API ----------------------------------------------------------
    def detect(self, img_bgr: np.ndarray,
               mode: Union[str, Tuple[int, int]] = "AUTO", *,
               score_thr: Optional[float] = None,
               use_device_nms: bool = False,
               max_dets: Optional[int] = None,
               pad_divisor: int = 32,
               timings: Optional[dict] = None) -> Dict[str, np.ndarray]:
        """Detect faces in one BGR uint8/float image.

        Returns dict: bboxes (n,5) [x1 y1 x2 y2 score] in original image
        coords (score-desc), kps (n, 2K), labels (n,).

        timings: pass a dict to receive the per-call latency budget in
        seconds — {preproc, put, dispatch, device_readback, post}. The
        device execution and result readback are one segment: through an
        async transport only the host-side materialization bounds them.
        """
        t = time.perf_counter if timings is not None else None
        if t:
            t0 = t()
        score_thr = (self.cfg.test.score_thr if score_thr is None
                     else score_thr)
        det_img, det_scale = resize_img(img_bgr, mode, pad_divisor)
        if t:
            t1 = t()
            timings["preproc"] = t1 - t0
        if self.bf16 and det_img.dtype == np.uint8:
            # ship uint8: 4x less host->device traffic, cast on device
            x = jnp.asarray(det_img[None])
        else:
            x = jnp.asarray(det_img[None].astype(np.float32))
        if t:
            t2 = t()
            timings["put"] = t2 - t1
        h, w = det_img.shape[:2]

        if use_device_nms:
            top_k = max_dets or self.cfg.test.device_nms_pre
            fn = self._nms_fn(h, w, top_k)
            out = fn(self.params, self.state, x)
            if t:
                t3 = t()
                timings["dispatch"] = t3 - t2
            packed = np.asarray(out)          # ONE readback
            if t:
                t4 = t()
                timings["device_readback"] = t4 - t3
            dets = packed[:, :5]
            keep = packed[:, 5] > 0.5
            sel = dets[keep]
            kps_sel = packed[:, 6:][keep]
            # the compiled program bakes in cfg.test.score_thr; a HIGHER
            # per-call threshold is exact as a post-NMS filter (below-thr
            # boxes can only suppress other below-thr boxes)
            if score_thr > self.cfg.test.score_thr:
                m = sel[:, 4] >= score_thr
                sel, kps_sel = sel[m], kps_sel[m]
            elif score_thr < self.cfg.test.score_thr:
                raise ValueError(
                    "device-NMS path cannot lower score_thr below "
                    f"cfg.test.score_thr={self.cfg.test.score_thr}; "
                    "rebuild the Detector with a lower config threshold")
        else:
            out = self._raw_fn(h, w)(self.params, self.state, x)
            if t:
                t3 = t()
                timings["dispatch"] = t3 - t2
            scores, boxes, kps = out
            scores = np.asarray(scores)
            boxes = np.asarray(boxes)
            kps = np.asarray(kps)
            if t:
                t4 = t()
                timings["device_readback"] = t4 - t3
            valid = scores >= score_thr
            boxes_v, scores_v, kps_v = (boxes[valid], scores[valid],
                                        kps[valid])
            keep_idx = native.nms(boxes_v, scores_v,
                                  self.cfg.test.nms_iou_thr)
            if max_dets is not None and max_dets > 0:
                keep_idx = keep_idx[:max_dets]
            sel = np.concatenate(
                [boxes_v[keep_idx], scores_v[keep_idx, None]], axis=-1)
            kps_sel = kps_v[keep_idx]

        if det_scale != 1.0:
            sel = sel.copy()
            sel[:, :4] /= det_scale
            kps_sel = kps_sel / det_scale
        if t:
            timings["post"] = t() - t4
        return {
            "bboxes": sel.astype(np.float32),
            "kps": kps_sel.astype(np.float32),
            "labels": np.zeros((sel.shape[0],), np.int64),
        }

    def detect_batch(self, imgs_bgr, mode: Union[str, Tuple[int, int]], *,
                     score_thr: Optional[float] = None,
                     pad_divisor: int = 32,
                     use_device_nms: bool = False,
                     device_nms_top_k: int = 750):
        """Batched detection on one shared canvas (for mode-0/1/2 WIDER
        eval and serving): all images are letterboxed (tuple modes) or
        zero-padded to the bucket (ORIGIN/AUTO + pad_divisor) onto the
        SAME canvas shape, run as a single batch forward, then per-image
        host NMS. The caller groups images so the canvas is uniform
        (orientation groups for non-square tuple modes; padded-bucket
        groups for origin-size).

        use_device_nms=True fuses the whole-batch Pallas greedy-NMS
        kernel (ops/nms_pallas.py:pallas_nms_batched) into the program
        and reads back only the packed top-``device_nms_top_k`` rows
        per image — instead of the full (B, P, 15) raw maps + host C++
        NMS. Same keep set as the host path for images with at most
        device_nms_top_k candidates above cfg.test.score_thr; a HIGHER
        per-call score_thr is applied as an exact post-filter (same
        contract as detect()), a lower one raises."""
        import cv2  # noqa: F401 (resize_img uses it)

        score_thr = (self.cfg.test.score_thr if score_thr is None
                     else score_thr)
        views, scales = [], []
        for img in imgs_bgr:
            det_img, det_scale = resize_img(img, mode, pad_divisor)
            # ship uint8 when possible: 4x less host->device traffic,
            # cast to bf16 on device (same contract as detect())
            if not (self.bf16 and det_img.dtype == np.uint8):
                det_img = det_img.astype(np.float32)
            views.append(det_img)
            scales.append(det_scale)
        if not views:
            return []
        shapes = {v.shape for v in views}
        if len(shapes) != 1:
            # non-square canvases orient per image (resize_img flips the
            # (W, H) tuple for portrait inputs) and origin-size pads to
            # per-image buckets — a mixed batch cannot stack; callers
            # group by orientation / padded-bucket shape
            raise ValueError(
                f"detect_batch needs one canvas shape, got {shapes}; "
                "group landscape/portrait images separately for "
                "non-square modes, or by padded-bucket shape for "
                "ORIGIN/AUTO")
        x = np.stack(views)
        if self.mesh is not None and x.shape[0] % self.mesh.size == 0:
            # data-parallel eval: shard the batch rows over the mesh so
            # every chip works the sweep (the multi_gpu_test role,
            # reference mmdet/apis/test.py:179-209); results come back
            # gathered on host. Sub-mesh-size ladder chunks stay on one
            # device (uneven row sharding would force a retrace).
            from jax.sharding import NamedSharding, PartitionSpec as P
            x = jax.device_put(
                jnp.asarray(x), NamedSharding(self.mesh, P("dp")))
        else:
            x = jnp.asarray(x)
        h, w = views[0].shape[:2]
        sharded = self.mesh is not None and x.shape[0] % self.mesh.size == 0
        key = ((h, w) if not use_device_nms
               else (h, w, "nms", device_nms_top_k, sharded))
        if key not in self._batch_cache:
            sizes = self.model.featmap_sizes(h, w)
            priors = jnp.asarray(grid_priors(
                sizes, self.cfg.model.strides, self.cfg.model.prior_offset))

            def raw(params, state, x):
                if self.bf16:
                    x = x.astype(jnp.bfloat16)
                if self._folded is not None:
                    # folded-BN weights through XLA's conv emitters: the
                    # fastest trunk at batch (the Pallas stencil path
                    # only wins at batch 1 — see models/fused.py)
                    from ..models.fused import fused_forward
                    from ..models.head import flatten_level_outputs
                    flat = flatten_level_outputs(fused_forward(
                        self._folded, x, self.cfg.model,
                        use_pallas=False))
                else:
                    flat, _ = self.model.forward_flat(params, state, x,
                                                      train=False)
                cls = flat["cls"].astype(jnp.float32)
                obj = flat["obj"][..., 0].astype(jnp.float32)
                scores = jax.nn.sigmoid(cls[..., 0]) * jax.nn.sigmoid(obj)
                boxes = bbox_decode(priors,
                                    flat["bbox"].astype(jnp.float32))
                kps = kps_decode(priors, flat["kps"].astype(jnp.float32))
                return scores, boxes, kps

            def nms_tail(scores, boxes, kps):
                dets, keep, idx = pallas_nms_batched(
                    boxes, scores, top_k=device_nms_top_k,
                    iou_thr=self.cfg.test.nms_iou_thr,
                    score_thr=self.cfg.test.score_thr)
                # candidates above the compiled threshold, for exact
                # cap-truncation detection on the host (n_above > K)
                n_above = jnp.sum(
                    (scores >= self.cfg.test.score_thr).astype(
                        jnp.float32), axis=1)
                meta = jnp.broadcast_to(n_above[:, None, None],
                                        (*keep.shape, 1))
                return jnp.concatenate(
                    [dets, keep[..., None].astype(dets.dtype),
                     jnp.take_along_axis(kps, idx[..., None], axis=1),
                     meta], axis=-1)              # (B, K, 7 + 2*kps)

            if not use_device_nms:
                fn = jax.jit(raw)
            elif sharded:
                # the Pallas kernel is per-image along the batch rows,
                # so under a dp-sharded batch it runs per shard via
                # shard_map (XLA SPMD cannot partition a custom call)
                from jax.sharding import PartitionSpec as P

                def fn_sharded(params, state, x):
                    tail = jax.shard_map(
                        nms_tail, mesh=self.mesh,
                        in_specs=(P("dp"), P("dp"), P("dp")),
                        out_specs=P("dp"),
                        # the pallas_call's ShapeDtypeStruct carries no
                        # varying-mesh-axes annotation; per-shard
                        # correctness is asserted by the sharded-vs-
                        # unsharded parity test instead
                        check_vma=False)
                    return tail(*raw(params, state, x))
                fn = jax.jit(fn_sharded)
            else:
                fn = jax.jit(
                    lambda params, state, x: nms_tail(*raw(params, state,
                                                           x)))
            self._batch_cache[key] = fn

        if use_device_nms:
            if score_thr < self.cfg.test.score_thr:
                raise ValueError(
                    "device-NMS path cannot lower score_thr below "
                    f"cfg.test.score_thr={self.cfg.test.score_thr}; "
                    "rebuild the Detector with a lower config threshold")
            packed = np.asarray(self._batch_cache[key](
                self.params, self.state, x))       # ONE readback
            # cap-truncation guard: an image whose candidate count above
            # the compiled threshold EXCEEDS the top-k cap had candidates
            # dropped pre-NMS, so its keep set may differ from the
            # uncapped host path (AP caveat made observable;
            # detect_sweep aggregates this into its stats/warning)
            k_cap = packed.shape[1]
            self.last_devnms_saturated = int(
                (packed[:, 0, -1] > k_cap).sum())
            results = []
            for i, det_scale in enumerate(scales):
                keep = packed[i, :, 5] > 0.5
                if score_thr > self.cfg.test.score_thr:
                    keep &= packed[i, :, 4] >= score_thr
                sel = packed[i, keep, :5].copy()
                ksel = packed[i, keep, 6:-1].copy()
                if det_scale != 1.0:
                    sel[:, :4] /= det_scale
                    ksel /= det_scale
                results.append({"bboxes": sel.astype(np.float32),
                                "kps": ksel.astype(np.float32),
                                "labels": np.zeros((sel.shape[0],),
                                                   np.int64)})
            return results

        scores, boxes, kps = self._batch_cache[key](
            self.params, self.state, x)
        scores = np.asarray(scores)
        boxes = np.asarray(boxes)
        kps = np.asarray(kps)
        results = []
        for i, det_scale in enumerate(scales):
            valid = scores[i] >= score_thr
            bv, sv, kv = boxes[i][valid], scores[i][valid], kps[i][valid]
            keep = native.nms(bv, sv, self.cfg.test.nms_iou_thr)
            sel = np.concatenate([bv[keep], sv[keep, None]], axis=-1)
            ksel = kv[keep]
            if det_scale != 1.0:
                sel[:, :4] /= det_scale
                ksel = ksel / det_scale
            results.append({"bboxes": sel.astype(np.float32),
                            "kps": ksel.astype(np.float32),
                            "labels": np.zeros((sel.shape[0],),
                                               np.int64)})
        return results

    def detect_sweep(self, entries, mode: Union[str, Tuple[int, int]], *,
                     pad_divisor: int = 32, batch_size: int = 32,
                     score_thr: Optional[float] = None,
                     on_result=None, use_device_nms: bool = False,
                     device_nms_top_k: int = 750,
                     prefetch: bool = True):
        """Batched detection sweep over many images of varying sizes —
        the engine behind tools/test_widerface.py and the in-training
        eval hook (~5-7x the reference's bs=1 loop on a TPU).

        entries: sequence of (load_fn, (height, width)) — load_fn() is
        called lazily per chunk; the size hint (e.g. labelv2 header
        dims) drives the grouping. Images group by their canvas_shape
        (the same rule resize_img applies), chunks pad up a
        {1,2,4,...,batch_size} ladder so each canvas compiles at most a
        few batch sizes, and any image whose LOADED size disagrees with
        its hint (EXIF rotation, stale header) falls back to a solo
        detect() instead of aborting the sweep.

        Returns results in input order; on_result(index, result) fires
        as each completes (for progress reporting).

        use_device_nms/device_nms_top_k pass through to detect_batch:
        whole-batch Pallas NMS fused into the program with a packed
        top-k readback instead of full raw maps + host C++ NMS.

        prefetch=True decodes the NEXT chunk's images on a lookahead
        thread while the current chunk runs its forward + NMS — the
        single_gpu_test loop's DataLoader-worker overlap (reference
        mmdet/apis/test.py:23-78), here one chunk deep.
        """
        groups: dict = {}
        for idx, (load_fn, (h, w)) in enumerate(entries):
            key = canvas_shape(int(h), int(w), mode, pad_divisor)
            groups.setdefault(key, []).append((idx, load_fn, (h, w)))

        ladder = [batch_size]
        while ladder[-1] > 1:
            ladder.append(ladder[-1] // 2)
        # per-canvas compiled batch sizes: {1, 2, 4, ..., batch_size}

        results: dict = {}
        stats = {"images": len(entries), "misfit_solo": 0, "batches": 0,
                 "devnms_saturated": 0}

        def emit(idx, res):
            results[idx] = res
            if on_result is not None:
                on_result(idx, res)

        tasks = [(key, members[start:start + batch_size])
                 for key, members in groups.items()
                 for start in range(0, len(members), batch_size)]

        def load_chunk(task):
            key, chunk = task
            loaded, misfits = [], []
            for idx, load_fn, hint in chunk:
                img = load_fn()
                actual = canvas_shape(img.shape[0], img.shape[1],
                                      mode, pad_divisor)
                (loaded if actual == key else misfits).append((idx, img))
            return loaded, misfits

        def process(loaded, misfits):
            for idx, img in misfits:   # hint was wrong: run solo
                stats["misfit_solo"] += 1
                # keep the NMS backend uniform across the sweep: the
                # solo fallback honors use_device_nms with the same
                # per-image cap (detect() maps max_dets to top_k)
                emit(idx, self.detect(img, mode=mode,
                                      score_thr=score_thr,
                                      pad_divisor=pad_divisor,
                                      use_device_nms=use_device_nms,
                                      max_dets=(device_nms_top_k
                                                if use_device_nms
                                                else None)))
            # a partial chunk runs as remainder-ladder sub-batches
            # (17 -> 16 + 1) instead of padding up with duplicated
            # images — no wasted forward or host-NMS work, and only
            # ladder sizes compile (log2(batch_size) per canvas)
            pos = 0
            while pos < len(loaded):
                size = next(s for s in ladder
                            if s <= len(loaded) - pos)
                part = loaded[pos:pos + size]
                pos += size
                stats["batches"] += 1
                outs = self.detect_batch(
                    [img for _, img in part], mode,
                    score_thr=score_thr, pad_divisor=pad_divisor,
                    use_device_nms=use_device_nms,
                    device_nms_top_k=device_nms_top_k)
                if use_device_nms:
                    stats["devnms_saturated"] += self.last_devnms_saturated
                for (idx, _), out in zip(part, outs):
                    emit(idx, out)

        if prefetch and len(tasks) > 1:
            # decode chunk t+1 on a lookahead thread while chunk t runs
            # forward + NMS (cv2/PIL decode releases the GIL)
            from concurrent.futures import ThreadPoolExecutor
            ex = ThreadPoolExecutor(max_workers=1)
            try:
                fut = ex.submit(load_chunk, tasks[0])
                for t in range(len(tasks)):
                    loaded, misfits = fut.result()
                    if t + 1 < len(tasks):
                        fut = ex.submit(load_chunk, tasks[t + 1])
                    process(loaded, misfits)
            finally:
                ex.shutdown(wait=True)
        else:
            for task in tasks:
                process(*load_chunk(task))
        if stats["misfit_solo"]:
            import logging
            logging.getLogger("yunet_tpu").warning(
                "detect_sweep: %d/%d images had stale size hints and ran "
                "solo (batch-1)", stats["misfit_solo"], stats["images"])
        if stats["devnms_saturated"]:
            import logging
            logging.getLogger("yunet_tpu").warning(
                "detect_sweep: %d/%d images saturated the device-NMS "
                "pre-NMS cap (device_nms_top_k=%d) — their keep sets "
                "may differ from uncapped host NMS; raise the cap or "
                "use host NMS for protocol-exact AP",
                stats["devnms_saturated"], stats["images"],
                device_nms_top_k)
        self.last_sweep_stats = stats
        return [results[i] for i in range(len(results))]

    def detect_tta(self, img_bgr: np.ndarray,
                   scales=((640, 640),), flip: bool = False, *,
                   score_thr: Optional[float] = None
                   ) -> Dict[str, np.ndarray]:
        """Multi-scale (+ horizontal-flip) test-time augmentation: run each
        view, map detections back to original coords, merge with one final
        NMS — the MultiScaleFlipAug + merge_aug path of the reference
        (datasets/pipelines/test_time_aug.py:11-121,
        dense_test_mixins aug_test)."""
        all_boxes, all_kps = [], []
        views = [(s, False) for s in scales]
        if flip:
            views += [(s, True) for s in scales]
        w = img_bgr.shape[1]
        for scale, flipped in views:
            view = img_bgr[:, ::-1] if flipped else img_bgr
            r = self.detect(np.ascontiguousarray(view), mode=scale,
                            score_thr=score_thr)
            bb, kp = r["bboxes"], r["kps"]
            if flipped and bb.shape[0]:
                bb = bb.copy()
                x1 = w - bb[:, 2]
                x2 = w - bb[:, 0]
                bb[:, 0], bb[:, 2] = x1, x2
                kp = kp.reshape(-1, kp.shape[1] // 2, 2).copy()
                kp = kp[:, [1, 0, 2, 4, 3], :]  # landmark reorder
                kp[..., 0] = w - kp[..., 0]
                kp = kp.reshape(bb.shape[0], -1)
            all_boxes.append(bb)
            all_kps.append(kp)
        boxes = np.concatenate(all_boxes, 0)
        kps = np.concatenate(all_kps, 0)
        keep = native.nms(boxes[:, :4], boxes[:, 4],
                          self.cfg.test.nms_iou_thr)
        return {"bboxes": boxes[keep], "kps": kps[keep],
                "labels": np.zeros((len(keep),), np.int64)}

    def warmup(self, shapes):
        for (h, w) in shapes:
            self.detect(np.zeros((h, w, 3), np.uint8), mode="AUTO")
