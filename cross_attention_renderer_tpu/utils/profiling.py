"""Profiling / tracing utilities.

Replaces the reference's vestigial ``torch.autograd.profiler.record_function``
scopes (resnet_block_fc.py:54,139) and hand prints (eval_realestate10k.py:151)
with the TPU-native tools: ``jax.profiler`` traces viewable in
TensorBoard/XProf, plus a simple rays/sec throughput meter.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace into ``log_dir`` (open with TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Running rays/sec + step-time meter for training/eval loops."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list[float] = []
        self._rays: list[int] = []

    def step(self, n_rays: int):
        self._times.append(time.perf_counter())
        self._rays.append(n_rays)
        if len(self._times) > self.window + 1:
            self._times.pop(0)
            self._rays.pop(0)

    @property
    def rays_per_sec(self) -> Optional[float]:
        if len(self._times) < 2:
            return None
        dt = self._times[-1] - self._times[0]
        return sum(self._rays[1:]) / dt if dt > 0 else None

    @property
    def steps_per_sec(self) -> Optional[float]:
        if len(self._times) < 2:
            return None
        dt = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / dt if dt > 0 else None
