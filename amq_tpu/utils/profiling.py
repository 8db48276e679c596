"""Tracing / profiling utilities.

The reference has no tracing beyond manual ``time.time`` spans
(SURVEY §5).  Here: a nestable wall-clock span recorder plus optional
jax profiler capture (TensorBoard trace) for kernel-level analysis.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Optional


class Tracer:
    """Lightweight span recorder: ``with tracer.span('eval'): ...``."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": self.totals[k], "count": self.counts[k],
                "mean_ms": self.totals[k] / self.counts[k] * 1e3}
            for k in sorted(self.totals)
        }

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=1)


@contextlib.contextmanager
def device_trace(logdir: Optional[str]):
    """jax profiler capture (view with TensorBoard); no-op when logdir is
    falsy or the profiler is unavailable on the backend."""
    if not logdir:
        yield
        return
    import jax
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
