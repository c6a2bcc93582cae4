"""yunet_tpu — a TPU-native (JAX/XLA/Pallas) face-detection framework.

A ground-up rebuild of the capabilities of ShiqiYu/libfacedetection.train
(the YuNet training/eval/export stack, a trimmed MMDetection fork) designed
for TPU hardware: functional model with explicit parameter pytrees, fixed
static shapes everywhere, SPMD data parallelism over a `jax.sharding.Mesh`,
and host-side native (C++) kernels where the reference relied on mmcv's
C++/CUDA ops.

Layout:
  models/    ConvDPUnit / backbone / TFPN neck / head / detector (pure fns)
  ops/       priors, box decode/encode, IoU, losses, SimOTA, NMS
  data/      labelv2 parser, augmentation pipeline, batched loader
  train/     loss + train step, LR schedules, train loop runtime
  parallel/  mesh + sharding rules
  eval/      WIDER Face AP evaluation, inference helpers
  export/    C++ weight-file generation (libfacedetection), ONNX (gated)
  utils/     torch checkpoint import, logging, profiling
  native/    C++ host kernels (exact NMS, eval matching) via ctypes
"""

__version__ = "0.1.0"

import os as _os


def enable_compilation_cache(path: str = None) -> None:
    """Persistent XLA compilation cache — first compiles of the conv trunk
    through the remote-compile tunnel cost minutes; cached recompiles are
    instant. Called automatically on import (YUNET_TPU_NO_CACHE=1 opts out).
    """
    import jax

    if path is None:
        # Key the cache dir by host CPU identity: the repo dir (and thus a
        # shared cache) can move between machines, and XLA:CPU AOT artifacts
        # compiled for another host's CPU features can SIGILL when loaded.
        import hashlib
        try:
            with open("/proc/cpuinfo") as f:
                flags = next((ln for ln in f if ln.startswith("flags")), "")
        except OSError:
            flags = ""
        import platform
        key = hashlib.sha1(
            (platform.machine() + flags).encode()).hexdigest()[:12]
        path = _os.path.join(
            _os.path.dirname(_os.path.abspath(__file__)), "..",
            ".jax_cache", key)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          _os.path.abspath(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


if not _os.environ.get("YUNET_TPU_NO_CACHE"):
    enable_compilation_cache()


def _honor_platform_env() -> None:
    """Mirror JAX_PLATFORMS into jax.config: the axon PJRT plugin in this
    image registers itself at interpreter start and wins over the env var,
    so ``JAX_PLATFORMS=cpu python tools/...`` silently runs on the TPU
    unless the platform is forced through the config."""
    plat = _os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            import jax
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass  # backend already initialized; too late to change


_honor_platform_env()
