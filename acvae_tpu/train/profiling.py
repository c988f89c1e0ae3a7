"""Profiling and timing hooks.

The reference has no tracing/profiling at all (SURVEY §5: "none. Only tqdm
progress bars").  This module adds the cheap TPU-native wins:

* :func:`trace` — context manager around ``jax.profiler.trace`` writing a
  TensorBoard-viewable trace (pass ``profile_dir`` to the Trainer/CLI);
* :class:`StepTimer` — wall-clock step timing with warmup skipping and
  percentile summaries; on tunneled platforms where ``block_until_ready`` is
  asynchronous, pass a ``sync`` callable that fetches a scalar.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """Profile the enclosed block when logdir is set; no-op otherwise."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, warmup: int = 2, sync: Optional[Callable] = None):
        self.warmup = warmup
        self.sync = sync
        self.times: List[float] = []
        self._t0: Optional[float] = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync is not None:
            self.sync()
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {"mean_s": float(arr.mean()),
                "p50_s": float(np.percentile(arr, 50)),
                "p90_s": float(np.percentile(arr, 90)),
                "steps_per_s": float(1.0 / arr.mean())}
