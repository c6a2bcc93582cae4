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


def make_wider_eval_hook(cfg: Config, *,
                         mode: Union[str, Tuple[int, int]] = "ORIGIN",
                         ann: Optional[str] = None,
                         img_prefix: Optional[str] = None,
                         gt_dir: Optional[str] = None,
                         pad_divisor: int = 32,
                         limit: int = 0,
                         use_ema: bool = True,
                         mesh=None,
                         use_device_nms: bool = False,
                         device_nms_top_k: int = 750):
    """Build an ``(train_state, step) -> {'easy','medium','hard'}`` hook.

    limit: evaluate only the first N val images (0 = all) — useful to keep
    in-training eval cheap; the reported APs then cover that subset.
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
        det.mesh = mesh

    def hook(ts, step):
        import jax
        import jax.numpy as jnp
        if jax.process_count() > 1 and jax.process_index() != 0:
            # multi-process: the sweep runs on process 0 only, on arrays
            # rebuilt from the local (replicated) shards — binding the
            # global jax.Arrays directly would turn every per-image jit
            # into a lockstep multihost dispatch on all processes. The
            # other processes return to training and simply wait at
            # their next collective.
            return None
        from ..train.checkpoint import to_host
        params = (ts.ema_params
                  if use_ema and ts.ema_params is not None else ts.params)
        det.params = jax.tree.map(lambda x: jnp.asarray(to_host(x)),
                                  params)
        det.state = jax.tree.map(lambda x: jnp.asarray(to_host(x)),
                                 ts.state)

        def load(rec):
            img = cv2.imread(os.path.join(img_prefix, rec.filename))
            if img is None:
                raise FileNotFoundError(rec.filename)
            return img

        # batched sweep — same engine as tools/test_widerface.py
        outs = det.detect_sweep(
            [((lambda r=rec: load(r)), (rec.height, rec.width))
             for rec in records],
            mode, pad_divisor=pad_divisor,
            use_device_nms=use_device_nms,
            device_nms_top_k=device_nms_top_k)
        results = {}
        for rec, out in zip(records, outs):
            bb = out["bboxes"]
            xywh = np.concatenate(
                [bb[:, :2], bb[:, 2:4] - bb[:, :2], bb[:, 4:5]], axis=1)
            event, name = rec.filename.split("/")
            results.setdefault(event, {})[
                os.path.splitext(name)[0]] = xywh.astype(np.float64)
        easy, medium, hard = wider_evaluation(results, gt_dir)
        return {"easy": float(easy), "medium": float(medium),
                "hard": float(hard)}

    return hook
