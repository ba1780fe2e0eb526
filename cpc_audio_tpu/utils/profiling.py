"""Profiling and throughput telemetry (SURVEY.md §5: the reference had only
wall-clock prints; this adds windows/sec/chip and jax.profiler traces)."""

from __future__ import annotations

import contextlib
import time
from typing import Optional


class ThroughputMeter:
    """Tracks windows/sec (and per-chip) over a sliding accumulation."""

    def __init__(self, n_devices: int = 1):
        self.n_devices = n_devices
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._windows = 0
        self._steps = 0

    def update(self, batch_size: int) -> None:
        self._windows += batch_size
        self._steps += 1

    @property
    def windows_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._windows / dt if dt > 0 else 0.0

    @property
    def windows_per_sec_per_chip(self) -> float:
        return self.windows_per_sec / max(self.n_devices, 1)

    def summary(self) -> str:
        return (f"{self.windows_per_sec:.1f} windows/s "
                f"({self.windows_per_sec_per_chip:.1f} windows/s/chip, "
                f"{self._steps} steps)")


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
