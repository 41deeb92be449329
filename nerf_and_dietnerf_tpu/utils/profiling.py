"""Profiling and debugging hooks (SURVEY §5: the reference has none —
only wall-clock prints, ``src/ExecutionRun.py:541-555``).

- :func:`trace` — context manager around ``jax.profiler`` trace capture;
  view the result with TensorBoard or Perfetto.
- :class:`StepTimer` — cheap rolling rays/sec/step-time counter for the
  training loop (the BASELINE headline metric is rays/sec/chip).
- :func:`enable_nan_checks` — flips on ``jax_debug_nans`` for bug hunts.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Deque, Optional


@contextlib.contextmanager
def trace(log_dir: str, host_tracer_level: int = 2):
    """Capture a ``jax.profiler`` trace of the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir, host_tracer_level=host_tracer_level)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_checks(enable: bool = True) -> None:
    """Make jitted code fail loudly on NaNs (debug mode — recompiles)."""
    import jax

    jax.config.update("jax_debug_nans", enable)


class StepTimer:
    """Rolling throughput meter over the last ``window`` steps."""

    def __init__(self, rays_per_step: int, window: int = 50):
        self.rays_per_step = rays_per_step
        self._times: Deque[float] = deque(maxlen=window + 1)

    def tick(self) -> None:
        self._times.append(time.perf_counter())

    @property
    def step_time(self) -> Optional[float]:
        if len(self._times) < 2:
            return None
        return (self._times[-1] - self._times[0]) / (len(self._times) - 1)

    @property
    def rays_per_sec(self) -> Optional[float]:
        dt = self.step_time
        return None if dt is None else self.rays_per_step / dt
