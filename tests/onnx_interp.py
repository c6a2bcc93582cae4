"""Shim: the ONNX interpreter graduated into the package
(yunet_tpu/export/onnx_runtime.py); tests keep importing from here."""

from yunet_tpu.export.onnx_runtime import run_graph  # noqa: F401
