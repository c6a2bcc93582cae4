"""ctypes loader for the native host kernels (lazy g++ build, numpy fallback).

The shared library is compiled on first use into this directory; if no
compiler is available the pure-numpy fallbacks keep everything working
(slower, same results).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "yunet_ops.cpp")
_LIB = os.path.join(_DIR, "libyunet_ops.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.nms_f32.restype = ctypes.c_int
        lib.nms_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_float, ctypes.POINTER(ctypes.c_int)]
        lib.wider_match.restype = None
        lib.wider_match.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_float,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        _lib = lib
        return _lib


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def nms(boxes: np.ndarray, scores: np.ndarray,
        iou_thr: float) -> np.ndarray:
    """Exact greedy NMS. Returns kept indices, score-descending.

    Same semantics as the mmcv C++ op the reference calls
    (yunet_head.py:415): suppress when IoU > iou_thr.
    """
    n = boxes.shape[0]
    if n == 0:
        return np.zeros((0,), np.int64)
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    lib = get_lib()
    if lib is not None:
        keep = np.empty((n,), np.int32)
        m = lib.nms_f32(_f32p(boxes), _f32p(scores), n,
                        ctypes.c_float(iou_thr), _i32p(keep))
        return keep[:m].astype(np.int64)
    return _nms_numpy(boxes, scores, iou_thr)


def _nms_numpy(boxes: np.ndarray, scores: np.ndarray,
               iou_thr: float) -> np.ndarray:
    order = np.argsort(-scores, kind="stable")
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        rest = order[1:]
        ix1 = np.maximum(x1[i], x1[rest])
        iy1 = np.maximum(y1[i], y1[rest])
        ix2 = np.minimum(x2[i], x2[rest])
        iy2 = np.minimum(y2[i], y2[rest])
        inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
        union = area[i] + area[rest] - inter
        iou = np.where(union > 0, inter / np.maximum(union, 1e-12), 0)
        order = rest[iou <= iou_thr]
    return np.asarray(keep, np.int64)


def wider_match(preds: np.ndarray, gts: np.ndarray, keep_mask: np.ndarray,
                iou_thr: float) -> Tuple[np.ndarray, np.ndarray]:
    """Per-image WIDER matching. preds (N,5) xywh+score (score-desc),
    gts (M,4) xywh, keep_mask (M,) int (1 = evaluated). Returns
    (pred_recall (N,), proposal (N,))."""
    n, m = preds.shape[0], gts.shape[0]
    preds = np.ascontiguousarray(preds, np.float32)
    gts = np.ascontiguousarray(gts, np.float32)
    keep_mask = np.ascontiguousarray(keep_mask, np.int32)
    lib = get_lib()
    if lib is not None:
        pred_recall = np.empty((n,), np.int32)
        proposal = np.empty((n,), np.int32)
        lib.wider_match(_f32p(preds), n, _f32p(gts), m, _i32p(keep_mask),
                        ctypes.c_float(iou_thr), _i32p(pred_recall),
                        _i32p(proposal))
        return pred_recall, proposal
    return _wider_match_numpy(preds, gts, keep_mask, iou_thr)


def _wider_match_numpy(preds, gts, keep_mask, iou_thr):
    n, m = preds.shape[0], gts.shape[0]
    p = preds.astype(np.float64)
    g = gts.astype(np.float64)
    px2, py2 = p[:, 0] + p[:, 2], p[:, 1] + p[:, 3]
    gx2, gy2 = g[:, 0] + g[:, 2], g[:, 1] + g[:, 3]
    parea = (px2 - p[:, 0] + 1) * (py2 - p[:, 1] + 1)
    garea = (gx2 - g[:, 0] + 1) * (gy2 - g[:, 1] + 1)
    iw = (np.minimum(px2[:, None], gx2) - np.maximum(p[:, None, 0], g[:, 0])
          + 1)
    ih = (np.minimum(py2[:, None], gy2) - np.maximum(p[:, None, 1], g[:, 1])
          + 1)
    inter = iw * ih
    iou = inter / (parea[:, None] + garea - inter)
    iou[(iw <= 0) | (ih <= 0)] = 0
    best = iou.argmax(axis=1)
    best_ov = iou[np.arange(n), best]
    recall_list = np.zeros((m,), np.int8)
    pred_recall = np.zeros((n,), np.int32)
    proposal = np.ones((n,), np.int32)
    claimed = 0
    for h in range(n):
        if best_ov[h] >= iou_thr:
            k = best[h]
            if keep_mask[k] == 0:
                recall_list[k] = -1
                proposal[h] = -1
            elif recall_list[k] == 0:
                recall_list[k] = 1
                claimed += 1
        pred_recall[h] = claimed
    return pred_recall, proposal
