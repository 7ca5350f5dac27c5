"""Profiling & observability helpers.

The reference has only ad-hoc `time.time()` around a forward
(tests/test_diffuser.py:38-43) and tqdm bars. Here (SURVEY.md §5):
`jax.profiler` trace hooks plus step-time / throughput counters usable
from the train loop and benchmarks.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def sync(x) -> float:
    """Synchronize on device work by fetching a scalar reduction.

    On tunneled backends (axon) `block_until_ready` can be a no-op and
    bulk transfers are slow; a scalar fetch is the reliable sync point.
    """
    return float(jnp.sum(x))


@dataclass
class StepTimer:
    """Step-time / samples-per-sec counter for the train loop."""

    window: int = 50
    _times: List[float] = field(default_factory=list, repr=False)
    _last: Optional[float] = None

    def tick(self) -> None:
        now = time.time()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    @property
    def step_ms(self) -> float:
        return 1000.0 * float(np.mean(self._times)) if self._times else float("nan")

    def samples_per_sec(self, batch_size: int) -> float:
        if not self._times:
            return float("nan")
        return batch_size / float(np.mean(self._times))

    def summary(self, batch_size: int) -> Dict[str, float]:
        return {
            "step_ms": self.step_ms,
            "samples_per_sec": self.samples_per_sec(batch_size),
        }


def benchmark(fn, *args, reps: int = 10, warmup: int = 1) -> float:
    """Average seconds per call, synchronizing via scalar fetch."""
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / reps
