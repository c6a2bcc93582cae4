"""Eval-during-training: WIDER Face val AP hook.

Counterpart of the reference's EvalHook/DistEvalHook registration
(mmdet/core/evaluation/eval_hooks.py:24-130, enabled by
configs/yunet_n.py:146): every N epochs the training loop calls the hook,
which runs the full WIDER val protocol on the *current* parameters (EMA
parameters when EMA is enabled, matching the reference's evaluated model)
and returns {easy, medium, hard} APs. The loop logs them to train.log and
metrics.jsonl under the ``val`` prefix.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple, Union

import numpy as np

from ..config import Config
from ..data.labelv2 import parse_labelv2
from .detect import Detector
from .widerface import wider_evaluation


def widerface_eval_mode(mode: int) -> Union[str, Tuple[int, int]]:
    """Numeric WIDER protocol mode -> Detector mode, exactly as
    tools/test_widerface.py (reference tools/test_widerface.py:76-97):
    0 = 640x640, 1 = 1650x1100, 2 = origin size, >30 = NxN square."""
    if mode == 0:
        return (640, 640)
    if mode == 1:
        return (1650, 1100)
    if mode == 2:
        return "ORIGIN"
    if mode > 30:
        return (mode, mode)
    raise ValueError(f"bad WIDER eval mode {mode}")


def _gather_sharded_detections(bbs, n_total, pcount, pidx):
    """All-gather each process's packed per-image detections and rebuild
    the global record order on process 0 (the collect half of the
    reference's multi_gpu_test, mmdet/apis/test.py:81,179-209 — there a
    dist.broadcast/part-pickle gather, here a single process_allgather
    of fixed-shape arrays). Returns the full per-record list on process
    0, None elsewhere.

    Detections stay float32 end to end, so the gathered copies are
    bit-identical to a single-process sweep's.
    """
    from jax.experimental import multihost_utils

    local_max = np.int32(max((len(b) for b in bbs), default=0))
    k = max(1, int(np.max(multihost_utils.process_allgather(local_max))))
    length = -(-n_total // pcount)  # ceil: max shard length, all procs
    packed = np.zeros((length, k, 5), np.float32)
    counts = np.zeros((length,), np.int32)
    for i, bb in enumerate(bbs):
        counts[i] = len(bb)
        packed[i, :len(bb)] = bb
    g_packed = np.asarray(multihost_utils.process_allgather(packed))
    g_counts = np.asarray(multihost_utils.process_allgather(counts))
    if pidx != 0:
        return None
    out = [None] * n_total
    for p in range(pcount):
        for j in range(len(range(p, n_total, pcount))):
            out[p + j * pcount] = g_packed[p, j, :g_counts[p, j]]
    return out


def make_wider_eval_hook(cfg: Config, *,
                         mode: Union[str, Tuple[int, int]] = "ORIGIN",
                         ann: Optional[str] = None,
                         img_prefix: Optional[str] = None,
                         gt_dir: Optional[str] = None,
                         pad_divisor: int = 32,
                         limit: int = 0,
                         use_ema: bool = True,
                         also_raw: bool = False,
                         mesh=None,
                         use_device_nms: bool = False,
                         device_nms_top_k: int = 750):
    """Build an ``(train_state, step) -> {'easy','medium','hard'}`` hook.

    limit: evaluate only the first N val images (0 = all) — useful to keep
    in-training eval cheap; the reported APs then cover that subset.
    also_raw: when EMA parameters are present AND use_ema, additionally
    sweep the RAW (non-EMA) parameters each interval and report their APs
    under ``raw_easy/raw_medium/raw_hard`` — one training run then yields
    the full EMA-vs-raw A/B trajectory (the reference's shipped configs
    do not enable EMA; core/hook/ema.py is library surface).
    mesh: optional jax device mesh — the sweep's batched forwards then
    shard their rows over all local devices instead of leaving every chip
    but one idle during in-training eval (the multi_gpu_test role,
    reference mmdet/apis/test.py:179-209).
    use_device_nms: fuse the whole-batch Pallas NMS into the sweep and
    read back only packed top-``device_nms_top_k`` rows per image —
    on hosts with a slow device link the origin-size raw-map readbacks
    dominate the hook's wall time. Detections cap at device_nms_top_k
    per image (AP-identical unless an image has more candidates above
    cfg.test.score_thr).
    """
    import cv2

    ann = ann or cfg.data.val_ann
    img_prefix = img_prefix or cfg.data.val_img_prefix
    gt_dir = gt_dir or cfg.data.gt_dir
    records = parse_labelv2(ann, test_mode=True)
    if limit:
        records = records[:limit]
    det = Detector(cfg)  # params swapped in per call
    if mesh is not None and getattr(mesh, "size", 1) > 1:
        import jax
        local = [d for d in mesh.devices.flat
                 if d.process_index == jax.process_index()]
        if len(local) == mesh.size:
            det.mesh = mesh
        elif len(local) > 1:
            # multi-process mesh: the sweep must dispatch on LOCAL
            # devices only — binding the global mesh would turn every
            # per-image jit into a lockstep multihost dispatch
            from jax.sharding import Mesh
            det.mesh = Mesh(np.array(local), ("dp",))

    def _sweep(params, state):
        import jax
        import jax.numpy as jnp
        # multi-process: each process sweeps a round-robin shard of the
        # val set on its local devices, then the packed detections are
        # all-gathered and process 0 runs the protocol once (DistEvalHook
        # + multi_gpu_test, reference mmdet/apis/test.py:81,179-209 and
        # core/evaluation/eval_hooks.py:78-130) — no host idles through
        # in-training eval.
        pcount, pidx = jax.process_count(), jax.process_index()
        my_records = records[pidx::pcount] if pcount > 1 else records
        from ..train.checkpoint import to_host
        det.params = jax.tree.map(lambda x: jnp.asarray(to_host(x)),
                                  params)
        det.state = jax.tree.map(lambda x: jnp.asarray(to_host(x)),
                                 state)

        def load(rec):
            img = cv2.imread(os.path.join(img_prefix, rec.filename))
            if img is None:
                raise FileNotFoundError(rec.filename)
            return img

        # batched sweep — same engine as tools/test_widerface.py
        outs = det.detect_sweep(
            [((lambda r=rec: load(r)), (rec.height, rec.width))
             for rec in my_records],
            mode, pad_divisor=pad_divisor,
            use_device_nms=use_device_nms,
            device_nms_top_k=device_nms_top_k)
        bbs = [out["bboxes"] for out in outs]
        if pcount > 1:
            bbs = _gather_sharded_detections(bbs, len(records), pcount,
                                             pidx)
            if bbs is None:
                # non-zero process: detections delivered; the C++ WIDER
                # matcher runs once on process 0
                return None
        results = {}
        for rec, bb in zip(records, bbs):
            xywh = np.concatenate(
                [bb[:, :2], bb[:, 2:4] - bb[:, :2], bb[:, 4:5]], axis=1)
            event, name = rec.filename.split("/")
            results.setdefault(event, {})[
                os.path.splitext(name)[0]] = xywh.astype(np.float64)
        easy, medium, hard = wider_evaluation(results, gt_dir)
        return {"easy": float(easy), "medium": float(medium),
                "hard": float(hard)}

    def hook(ts, step):
        ema_active = use_ema and ts.ema_params is not None
        params = ts.ema_params if ema_active else ts.params
        aps = _sweep(params, ts.state)
        if ema_active and also_raw:
            raw = _sweep(ts.params, ts.state)
            if aps is not None and raw is not None:
                aps.update({f"raw_{k}": v for k, v in raw.items()})
        return aps

    return hook
