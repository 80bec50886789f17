"""First-class tracing / profiling (the reference has none — SURVEY.md §5).

- `trace(logdir)`: context manager around jax.profiler for TensorBoard/XProf
  traces of prefill / decode / vocode phases.
- `PhaseTimer`: lightweight named phase accounting for per-request metrics
  (prefill ms, per-frame ms, vocode ms, RTF).
- `annotate(name)`: TraceAnnotation wrapper so phases show up in traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    """Accumulates wall time per named phase.

    with timer.phase("prefill"): ...
    timer.report() -> {"prefill": {"total_s": ..., "count": ...}, ...}
    """

    def __init__(self):
        self._totals: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        with annotate(name):
            yield
        dt = time.perf_counter() - t0
        self._totals[name] += dt
        self._counts[name] += 1

    def report(self) -> dict:
        return {
            name: {
                "total_s": round(self._totals[name], 6),
                "count": self._counts[name],
                "mean_ms": round(self._totals[name] / self._counts[name] * 1e3, 3),
            }
            for name in self._totals
        }
