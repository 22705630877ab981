"""Tracing / profiling utilities — the TPU-native replacement for the
reference's gprof build flag and per-tool wall-clock prints (SURVEY.md §5.1).

- `trace(dir)`: context manager around `jax.profiler` producing a
  TensorBoard-loadable trace of device execution.
- `StepTimer`: per-step wall-clock statistics with forced device
  synchronization (the axon TPU tunnel's block_until_ready is asynchronous,
  so timers force a host materialization of a probe array).
- `annotate(name)`: named trace region (shows up in the profiler timeline).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/rwkv_tpu_trace"):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for the profiler timeline."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def force_sync(x) -> None:
    """Force completion of device work feeding `x` (host materialization —
    robust where block_until_ready is asynchronous, e.g. tunneled devices)."""
    arr = np.asarray(jax.tree_util.tree_leaves(x)[0]) if _is_tree(x) else np.asarray(x)
    del arr


def _is_tree(x) -> bool:
    return isinstance(x, (dict, list, tuple))


@dataclass
class StepTimer:
    """Accumulates per-step latencies; prints ms/token statistics like the
    reference tools (generate_completions.py:57-71)."""

    sync: bool = True
    _times: List[float] = field(default_factory=list)
    _t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if self.sync and result is not None:
            force_sync(result)
        dt = time.perf_counter() - self._t0
        self._times.append(dt)
        return dt

    @contextlib.contextmanager
    def step(self, result_getter=None):
        self.start()
        out = {}
        yield out
        self.stop(out.get("result"))

    @property
    def count(self) -> int:
        return len(self._times)

    @property
    def mean_ms(self) -> float:
        return float(np.mean(self._times) * 1e3) if self._times else 0.0

    @property
    def p50_ms(self) -> float:
        return float(np.percentile(self._times, 50) * 1e3) if self._times else 0.0

    @property
    def p99_ms(self) -> float:
        return float(np.percentile(self._times, 99) * 1e3) if self._times else 0.0

    def summary(self) -> str:
        return (
            f"{self.count} steps: mean {self.mean_ms:.3f} ms, "
            f"p50 {self.p50_ms:.3f} ms, p99 {self.p99_ms:.3f} ms, "
            f"{1000.0 / self.mean_ms if self.mean_ms else 0:.1f} steps/s"
        )
