"""High-level orchestration API — the L3 layer of the reference
(mmdet/apis/: init_detector, inference_detector, train_detector,
init_random_seed), re-shaped for JAX.

These are thin conveniences over the library: most users should reach for
yunet_tpu.eval.Detector and yunet_tpu.train.loop.fit directly.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Union

import numpy as np

from .config import Config, get_config
from .eval.detect import Detector
from .train.loop import fit as train_detector  # noqa: F401  (re-export)


def init_random_seed(seed: Optional[int] = None) -> int:
    """Pick a seed and make it identical on every process (the reference
    broadcasts from rank 0, apis/train.py:19-49; with jax the same effect
    comes from deriving it deterministically on process 0's key and using
    process-identical folding)."""
    import jax

    if seed is not None:
        return seed
    # all processes compute the same value from the same key
    key = jax.random.PRNGKey(0)
    return int(jax.random.randint(key, (), 0, 2 ** 31 - 1))


def set_random_seed(seed: int) -> None:
    """Seed host-side RNGs (device RNG is explicit-key in JAX)."""
    import random

    random.seed(seed)
    np.random.seed(seed)


def init_detector(config: Union[str, Config],
                  checkpoint: Optional[str] = None) -> Detector:
    """Build a Detector from a preset name/Config and a checkpoint
    (.pth reference file or orbax directory)."""
    cfg = get_config(config) if isinstance(config, str) else config
    if checkpoint is None:
        import jax
        from .models.detector import YuNet
        params, state = YuNet(cfg.model).init(jax.random.PRNGKey(0))
    elif checkpoint.endswith(".onnx"):
        from .export.onnx_import import load_onnx_params
        folded = load_onnx_params(checkpoint, cfg.model)
        return Detector(cfg, folded=folded)
    elif checkpoint.endswith(".pth"):
        from .utils.torch_import import load_pth_params
        params, state = load_pth_params(
            checkpoint,
            shared_stacked_convs=cfg.model.shared_stacked_convs)
    else:
        from .train.checkpoint import load_checkpoint
        from .train.step import init_train_state
        ts, _ = init_train_state(cfg, steps_per_epoch=1, total_batch=1)
        ts, _ = load_checkpoint(checkpoint, ts)
        params, state = ts.params, ts.state
    return Detector(cfg, params, state)


def inference_detector(detector: Detector,
                       imgs: Union[np.ndarray, Sequence[np.ndarray]],
                       mode: str = "AUTO") -> Union[Dict, list]:
    """Run detection on one image or a list of images (BGR ndarray)."""
    single = isinstance(imgs, np.ndarray)
    if single:
        imgs = [imgs]
    results = [detector.detect(img, mode=mode) for img in imgs]
    return results[0] if single else results
