#!/usr/bin/env python
"""Cross-engine inference benchmark + optional WIDER AP evaluation
(reference tools/compare_inference.py role).

Engines:
  jax:<config>:<checkpoint>    — the TPU Detector (device decode+NMS)
  onnx:<path>                  — any YuNet-contract ONNX file, executed by
                                 onnxruntime when available, else by the
                                 bundled numpy interpreter (slow, exact)

The ONNX path re-implements decode in pure numpy — a deliberately
independent copy of the numerical contract (reference keeps three:
torch/numpy/C++; compare_inference.py:334-415) that the tests require to
agree with the JAX decode.

  python tools/compare_inference.py --models jax:yunet_n:weights.pth \
      onnx:/root/reference/onnx/yunet_n_320_320.onnx --image img.jpg
"""

import argparse
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


class Timer:
    def __init__(self):
        self.total = 0.0
        self.n = 0

    def __enter__(self):
        self._t = time.perf_counter()
        return self

    def __exit__(self, *a):
        self.total += time.perf_counter() - self._t
        self.n += 1

    @property
    def fps(self):
        return self.n / self.total if self.total else 0.0


def numpy_decode_yunet(outputs, input_hw, score_thr=0.02, nms_thr=0.45):
    """Pure-numpy decode of the 12-output YuNet ONNX contract."""
    from yunet_tpu import native

    h, w = input_hw
    dets_all = []
    kps_all = []
    for i, stride in enumerate((8, 16, 32)):
        cls = outputs[f"cls_{stride}"][0]     # (HW, 1) sigmoided
        obj = outputs[f"obj_{stride}"][0]     # (HW, 1)
        bbox = outputs[f"bbox_{stride}"][0]   # (HW, 4)
        kps = outputs[f"kps_{stride}"][0]     # (HW, 10)
        fh, fw = h // stride, w // stride
        gx, gy = np.meshgrid(np.arange(fw), np.arange(fh))
        px = (gx.reshape(-1) * stride).astype(np.float32)
        py = (gy.reshape(-1) * stride).astype(np.float32)
        score = cls[:, 0] * obj[:, 0]
        cx = bbox[:, 0] * stride + px
        cy = bbox[:, 1] * stride + py
        bw = np.exp(bbox[:, 2]) * stride
        bh = np.exp(bbox[:, 3]) * stride
        boxes = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2,
                          cy + bh / 2], -1)
        kp = kps.reshape(-1, 5, 2) * stride + np.stack([px, py],
                                                       -1)[:, None, :]
        keepm = score >= score_thr
        dets_all.append(np.concatenate(
            [boxes[keepm], score[keepm, None]], -1))
        kps_all.append(kp[keepm].reshape(-1, 10))
    dets = np.concatenate(dets_all, 0)
    kps = np.concatenate(kps_all, 0)
    keep = native.nms(dets[:, :4], dets[:, 4], nms_thr)
    return dets[keep], kps[keep]


class OnnxEngine:
    """Runs a .onnx via onnxruntime when installed, else via the
    framework's compiled ONNX-on-TPU executor (OnnxExecutor)."""

    def __init__(self, path):
        self.path = path
        self.ort = None
        try:
            import onnxruntime as ort
            self.ort = ort.InferenceSession(path)
            shape = self.ort.get_inputs()[0].shape
        except ImportError:
            from yunet_tpu.export.onnx_runtime import OnnxExecutor
            self.executor = OnnxExecutor(path)
            shape = self.executor.input_shape
        self.hw = ((shape[2], shape[3]) if isinstance(shape[2], int)
                   else (320, 320))

    def detect(self, img_bgr):
        import cv2
        h, w = self.hw
        resized = cv2.resize(img_bgr, (w, h)).astype(np.float32)
        x = np.transpose(resized, (2, 0, 1))[None]
        if self.ort is not None:
            names = [o.name for o in self.ort.get_outputs()]
            outs = dict(zip(names, self.ort.run(None, {"input": x})))
        else:
            outs = self.executor(x)
        return numpy_decode_yunet(outs, (h, w))


class JaxEngine:
    def __init__(self, config, ckpt):
        from yunet_tpu.config import get_config
        from yunet_tpu.eval import Detector
        from detect_image import load_weights
        cfg = get_config(config)
        params, state = load_weights(cfg, ckpt)
        self.det = Detector(cfg, params, state)

    def detect(self, img_bgr):
        r = self.det.detect(img_bgr, mode=(320, 320),
                            use_device_nms=True)
        return r["bboxes"], r["kps"]


def build_engine(spec):
    kind, _, rest = spec.partition(":")
    if kind == "jax":
        config, _, ckpt = rest.partition(":")
        return JaxEngine(config, ckpt)
    if kind == "onnx":
        return OnnxEngine(rest)
    raise SystemExit(f"unknown engine spec {spec}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--models", nargs="+", required=True)
    p.add_argument("--image", required=True)
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args(argv)
    import cv2

    img = cv2.imread(args.image)
    if img is None:
        raise SystemExit(f"cannot read {args.image}")
    print(f"{'model':<60} {'faces':>6} {'FPS':>9}")
    for spec in args.models:
        eng = build_engine(spec)
        boxes, _ = eng.detect(img)  # warmup / compile
        t = Timer()
        for _ in range(args.iters):
            with t:
                boxes, _ = eng.detect(img)
        print(f"{spec:<60} {len(boxes):>6} {t.fps:>9.1f}")


if __name__ == "__main__":
    main()
