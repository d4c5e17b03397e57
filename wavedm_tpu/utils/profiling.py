"""Tracing / profiling utilities.

The reference's only observability is wall-clock data-time prints
(models/ddm_wavelet.py:207-213) and an ETA counter (train_hfrm.py:278-281).
Here: a step timer with rolling statistics, a context manager around
``jax.profiler`` for XLA-level traces viewable in TensorBoard/Perfetto, and
a lightweight JSONL metrics logger.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import deque
from typing import Dict, Iterator, Optional

import jax


class StepTimer:
    """Rolling per-step timing with device-sync-aware measurement."""

    def __init__(self, window: int = 50):
        self.times = deque(maxlen=window)
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, sync_on=None) -> float:
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0

    def throughput(self, items_per_step: int) -> float:
        return items_per_step / self.mean if self.mean else 0.0


@contextlib.contextmanager
def xla_trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA profiler trace (open with TensorBoard or Perfetto)."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in profiler traces (TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield


class MetricsLogger:
    """Append-only JSONL metrics log, process-0 only."""

    def __init__(self, path: str):
        self.path = path
        self.enabled = jax.process_index() == 0
        if self.enabled:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def log(self, step: int, **metrics: float) -> None:
        if not self.enabled:
            return
        rec: Dict = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
