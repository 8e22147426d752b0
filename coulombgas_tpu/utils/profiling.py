"""First-class profiling and step timing.

The reference has no tracing/profiling at all (SURVEY.md §5: only trace-time
prints).  Here profiling is a subsystem:

  * ``trace(logdir)`` — context manager around ``jax.profiler`` emitting a
    TensorBoard-loadable trace (XLA ops, fusion, HBM traffic);
  * ``StepTimer`` — device-synchronized wall-clock timing with warmup
    discard and summary statistics;
  * ``annotate`` — named trace regions (``jax.profiler.TraceAnnotation``)
    so sampler / accumulate / apply phases are distinguishable in the trace.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax

__all__ = ["trace", "annotate", "StepTimer"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace of the enclosed block into ``logdir``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


@dataclass
class StepTimer:
    """Synchronized per-step timing: ``with timer.step(): ...``.

    Blocks on the pytree passed to ``sync`` (or anything returned from the
    step body via ``timer.observe``) so async dispatch doesn't hide device
    time.  ``summary()`` reports mean/min/max over post-warmup steps.
    """

    warmup: int = 2
    times: list = field(default_factory=list)
    _count: int = 0

    @contextlib.contextmanager
    def step(self, sync_value=None):
        t0 = time.perf_counter()
        out = {}
        yield out
        sync = out.get("sync", sync_value)
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)

    def summary(self):
        if not self.times:
            return {"steps": 0}
        ts = self.times
        return {
            "steps": len(ts),
            "mean_s": sum(ts) / len(ts),
            "min_s": min(ts),
            "max_s": max(ts),
        }
