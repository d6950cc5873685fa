"""Tracing / profiling helpers (SURVEY.md §5).

The reference's only instrumentation is wall-clock timing of the
optimization loop (``cython_loops.pxi:223, 404-406``).  Here:

* ``maybe_trace(dir)`` — wraps a region in ``jax.profiler.trace`` so the
  fit can be inspected in TensorBoard / Perfetto (XLA op-level timeline).
* ``FitStats`` — per-fit throughput accounting (iterations, wall time,
  nonzeros/sec) surfaced on the model as ``fit_stats_`` after ``fit``.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@contextlib.contextmanager
def maybe_trace(profile_dir):
    if profile_dir:
        import jax

        with jax.profiler.trace(profile_dir):
            yield
    else:
        yield


@dataclass
class FitStats:
    nnz: int = 0
    iterations: int = 0
    wall_seconds: float = 0.0
    _t0: float = field(default=0.0, repr=False)

    def start(self):
        self._t0 = time.time()
        return self

    def stop(self, iterations: int):
        self.wall_seconds = time.time() - self._t0
        self.iterations = iterations
        return self

    @property
    def nnz_per_second(self) -> float:
        if self.wall_seconds <= 0:
            return 0.0
        return self.nnz * self.iterations / self.wall_seconds
