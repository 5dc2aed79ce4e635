"""Profiling & throughput observability.

The reference has none (SURVEY.md §5: wall-clock prints and nvitop only).
Here: a `jax.profiler` trace context that dumps xprof-compatible traces for
TensorBoard, and a throughput meter producing the north-star
patches/sec/chip number (BASELINE.json metric).
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(log_dir: str | Path):
    """Capture a device trace viewable in TensorBoard's profile plugin."""
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Patches/sec (/chip) over a sliding window of step timings."""

    def __init__(self, n_devices: int | None = None):
        self.n_devices = n_devices or jax.device_count()
        self.reset()

    def reset(self) -> None:
        self._t0 = None
        self.patches = 0
        self.seconds = 0.0

    def tick(self, batch_patches: int) -> None:
        now = time.perf_counter()
        if self._t0 is not None:
            self.seconds += now - self._t0
            self.patches += batch_patches
        self._t0 = now

    @property
    def patches_per_sec(self) -> float:
        return self.patches / self.seconds if self.seconds else 0.0

    @property
    def patches_per_sec_per_chip(self) -> float:
        return self.patches_per_sec / max(self.n_devices, 1)
