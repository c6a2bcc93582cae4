"""Profiling utilities — reference utils/profiling.py:11-41 role, JAX-native.

`profile_time` wraps a region with wall timing that is honest about async
dispatch (block_until_ready on given arrays); `trace` wraps a region with
jax.profiler so TensorBoard/perfetto traces can be captured on TPU.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


@contextlib.contextmanager
def profile_time(name: str, *, sync_on=None, logger=None,
                 enabled: bool = True):
    """Wall-clock a region; pass device arrays via sync_on to include their
    completion (the JAX analogue of the reference's CUDA-event sync)."""
    if not enabled:
        yield
        return
    t0 = time.perf_counter()
    yield
    if sync_on is not None:
        import jax
        jax.block_until_ready(sync_on)
    dt = (time.perf_counter() - t0) * 1000
    msg = f"{name}: {dt:.2f} ms"
    (logger.info if logger else print)(msg)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace",
          host_tracer_level: Optional[int] = None):
    """Capture a jax.profiler trace of the region (view in TensorBoard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling images/sec meter (IterTimerHook counterpart)."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []
        self._last = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now
        if self._times:
            return sum(self._times) / len(self._times)
        return None
