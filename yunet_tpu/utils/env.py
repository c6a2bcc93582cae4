"""Environment fingerprint + process setup.

collect_env mirrors the reference startup logging (utils/collect_env.py,
logged at tools/train.py:184-190); setup_multi_processes mirrors
utils/setup_env.py:10-53 (thread caps so the data-loader worker pool does
not oversubscribe the host).
"""

from __future__ import annotations

import os
import platform
import sys
from typing import Dict


def collect_env() -> Dict[str, str]:
    info = {
        "sys.platform": sys.platform,
        "Python": sys.version.replace("\n", ""),
        "Machine": platform.machine(),
    }
    try:
        import jax
        info["JAX"] = jax.__version__
        info["jax.default_backend"] = jax.default_backend()
        info["devices"] = ", ".join(str(d) for d in jax.devices())
        info["process_count"] = str(jax.process_count())
    except Exception as e:  # pragma: no cover
        info["JAX"] = f"unavailable ({e})"
    for mod in ("numpy", "optax", "orbax.checkpoint", "cv2"):
        try:
            m = __import__(mod)
            info[mod] = getattr(m, "__version__", "?")
        except ImportError:
            info[mod] = "not installed"
    try:
        import yunet_tpu
        info["yunet_tpu"] = yunet_tpu.__version__
    except Exception:
        pass
    return info


def env_string() -> str:
    return "\n".join(f"{k}: {v}" for k, v in collect_env().items())


def setup_multi_processes(workers: int = 4) -> None:
    """Cap math-library threads so cv2/numpy in loader workers don't
    oversubscribe cores (reference setup_env.py:26-53)."""
    for var in ("OMP_NUM_THREADS", "MKL_NUM_THREADS",
                "OPENBLAS_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    try:
        import cv2
        cv2.setNumThreads(0)
    except ImportError:
        pass
    enable_compilation_cache()


def enable_compilation_cache(path: str = None) -> None:
    """Persistent XLA compilation cache: the b128/640^2 fused train step
    compiles for minutes; the on-disk cache turns restarts (auto-resume,
    A/B sweeps, bench) into cache hits. Opt out with
    YUNET_NO_COMPILE_CACHE=1."""
    if os.environ.get("YUNET_NO_COMPILE_CACHE"):
        return
    import jax
    path = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass  # older jax or backend without cache support
