"""Load the REFERENCE evaluation code itself as a differential oracle.

Round-3 VERDICT missing #2: the repo's WIDER evaluator was protocol-
asserted (property tests) but never protocol-PROVEN against the code
that defines the north-star metric. These loaders import the reference's
`mmdet/core/evaluation/widerface.py` and `mean_ap.py` directly from
/root/reference (standalone numpy modules) so tests can feed both
evaluators identical inputs and assert equal APs.

The reference predates numpy 1.24 (uses the removed ``np.float`` /
``np.int`` / ``np.bool`` aliases) and mean_ap.py imports mmcv /
terminaltables only for pretty printing — shimmed here. This is a
test-only oracle import, not framework code.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import numpy as np

REF_EVAL = "/root/reference/mmdet/core/evaluation"


def _shim_numpy_aliases():
    for name, typ in (("float", float), ("int", int), ("bool", bool)):
        if not hasattr(np, name):
            setattr(np, name, typ)


def load_ref_widerface():
    """The official WIDER evaluator (reference widerface.py:274-346)."""
    _shim_numpy_aliases()
    if "ref_widerface" in sys.modules:
        return sys.modules["ref_widerface"]
    spec = importlib.util.spec_from_file_location(
        "ref_widerface", os.path.join(REF_EVAL, "widerface.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_widerface"] = mod
    spec.loader.exec_module(mod)
    return mod


def load_ref_mean_ap():
    """The reference eval_map (mean_ap.py:522). Loaded with its real
    bbox_overlaps; mmcv/terminaltables stubbed (printing only). The
    module registers in sys.modules so Pool workers (fork) can unpickle
    tpfp_default by qualified name."""
    _shim_numpy_aliases()
    if "ref_mean_ap" in sys.modules:
        return sys.modules["ref_mean_ap"]
    if "terminaltables" not in sys.modules:
        tt = types.ModuleType("terminaltables")

        class _AsciiTable:
            def __init__(self, *a, **k):
                self.table = ""
                self.inner_footing_row_border = False

        tt.AsciiTable = _AsciiTable
        sys.modules["terminaltables"] = tt
    if "mmcv" not in sys.modules:
        mmcv = types.ModuleType("mmcv")
        utils = types.ModuleType("mmcv.utils")
        utils.print_log = lambda *a, **k: None
        mmcv.utils = utils
        mmcv.is_str = lambda x: isinstance(x, str)
        sys.modules["mmcv"] = mmcv
        sys.modules["mmcv.utils"] = utils

    spec = importlib.util.spec_from_file_location(
        "ref_bbox_overlaps", os.path.join(REF_EVAL, "bbox_overlaps.py"))
    bo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bo)

    src = open(os.path.join(REF_EVAL, "mean_ap.py")).read()
    # the two package-relative imports, resolved by hand
    src = src.replace("from .bbox_overlaps import bbox_overlaps", "")
    src = src.replace("from .class_names import get_classes", "")
    mod = types.ModuleType("ref_mean_ap")
    mod.__file__ = os.path.join(REF_EVAL, "mean_ap.py")
    mod.bbox_overlaps = bo.bbox_overlaps
    mod.get_classes = lambda ds: ["face"]
    sys.modules["ref_mean_ap"] = mod
    exec(compile(src, mod.__file__, "exec"), mod.__dict__)
    return mod
