"""Tracing & step-time observability.

The reference has no profiling at all — wall-clock-free prints and a tqdm
bar are its only observability (SURVEY.md §5).  Here:

- :func:`trace` wraps ``jax.profiler`` so any region can be captured and
  viewed in TensorBoard/Perfetto (``python -m mmer_tpu.train.cli
  --profile_dir /tmp/trace`` profiles the first epochs);
- :class:`StepTimer` records wall-times for named phases and summarizes
  p50/p90/max — cheap enough to leave on in production loops.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Iterator, List, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace context; no-op when ``log_dir`` is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock phase timer with percentile summaries."""

    def __init__(self) -> None:
        self._times: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._times[name].append(time.perf_counter() - t0)

    def record(self, name: str, seconds: float) -> None:
        self._times[name].append(seconds)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out: Dict[str, Dict[str, float]] = {}
        for name, ts in self._times.items():
            ts_sorted = sorted(ts)
            n = len(ts_sorted)
            out[name] = {
                "count": n,
                "mean_s": sum(ts_sorted) / n,
                "p50_s": ts_sorted[n // 2],
                "p90_s": ts_sorted[min(n - 1, int(n * 0.9))],
                "max_s": ts_sorted[-1],
                "total_s": sum(ts_sorted),
            }
        return out

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)
