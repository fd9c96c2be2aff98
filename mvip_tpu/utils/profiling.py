"""First-class observability the reference lacks (SURVEY.md §5): per-step rays/sec,
wall-time windows, and optional `jax.profiler` traces."""

from __future__ import annotations

import contextlib
import time
from typing import Optional


class StepTimer:
    """Sliding-window throughput counter."""

    def __init__(self, rays_per_step: int, window: int = 50):
        self.rays_per_step = rays_per_step
        self.window = window
        self._t0: Optional[float] = None
        self._steps = 0

    def tick(self) -> Optional[float]:
        """Call once per completed step; returns rays/sec over the window or None."""
        now = time.perf_counter()
        if self._t0 is None:
            self._t0 = now
            self._steps = 0
            return None
        self._steps += 1
        if self._steps >= self.window:
            dt = now - self._t0
            rate = self._steps * self.rays_per_step / dt
            self._t0, self._steps = now, 0
            return rate
        return None


@contextlib.contextmanager
def maybe_trace(profile_dir: Optional[str]):
    if not profile_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
