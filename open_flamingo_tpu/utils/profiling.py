"""Profiling & throughput observability.

The reference only has wall-clock AverageMeters logged to wandb
(open_flamingo/train/train_utils.py:80-82,223-257). TPU-native additions:
jax.profiler traces (viewable in XProf/TensorBoard, captures XLA ops, HBM
usage, ICI collectives) and tokens+images/sec/chip counters — the
BASELINE.json metric.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class AverageMeter:
    """Parity with train_utils.py AverageMeter."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


class ThroughputMeter:
    """tokens+images/sec/chip over a sliding window."""

    def __init__(self):
        self.t0: Optional[float] = None
        self.tokens = 0
        self.images = 0

    def start(self):
        self.t0 = time.perf_counter()
        self.tokens = 0
        self.images = 0

    def step(self, tokens: int, images: int):
        if self.t0 is None:
            self.start()
        self.tokens += tokens
        self.images += images

    def rates_per_chip(self) -> dict:
        dt = max(time.perf_counter() - (self.t0 or 0.0), 1e-9)
        n = jax.device_count()
        return {
            "tokens_per_sec_per_chip": self.tokens / dt / n,
            "images_per_sec_per_chip": self.images / dt / n,
        }


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the profiler timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield
