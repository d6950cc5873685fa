"""Tracing / profiling helpers (SURVEY.md §5).

The reference's only instrumentation is wall-clock timing of the
optimization loop (``cython_loops.pxi:223, 404-406``).  Here:

* ``maybe_trace(dir)`` — wraps a region in ``jax.profiler.trace`` so the
  fit can be inspected in TensorBoard / Perfetto (XLA op-level timeline).
* ``FitStats`` — per-fit throughput accounting (iterations, wall time,
  nonzeros/sec) surfaced on the model as ``fit_stats_`` after ``fit``.
* ``enable_compilation_cache()`` — persistent on-disk XLA executable cache;
  at catalog scale the training program's compile runs minutes (remote
  compilation in this environment), and the cache turns every repeat fit /
  bench / restart into a sub-second load.
"""

from __future__ import annotations

import contextlib
import os
import time
from dataclasses import dataclass, field

_CACHE_ENABLED = False


def enable_compilation_cache(path: str | None = None) -> bool:
    """Point JAX's persistent compilation cache at a stable directory
    (default ``~/.cache/hpfrec_tpu/xla``; override or disable with the
    ``HPFREC_TPU_XLA_CACHE`` env var — empty/"0" disables).  Idempotent;
    returns True when the cache is active.  Measured in this environment:
    a 4096x4096 6-matmul program recompiles in 4.8 s cold, 0.19 s from the
    cache in a fresh process; the MillionSong-scale CAVI program's compile
    drops from minutes to seconds."""
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return True
    env = os.environ.get("HPFREC_TPU_XLA_CACHE")
    if env is not None and env in ("", "0", "off"):
        return False
    target = path or env or os.path.expanduser("~/.cache/hpfrec_tpu/xla")
    try:
        import jax

        os.makedirs(target, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", target)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _CACHE_ENABLED = True
        return True
    except Exception:  # pragma: no cover - older jax / read-only home
        return False


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
    """End-to-end fit statistics (the ``HPF.fit_stats_`` attribute).

    ``wall_seconds`` spans the whole optimization call, INCLUDING jit
    compiles, warm-up dispatches, and convergence evaluations, so
    ``nnz_per_second`` is an end-to-end figure — a lower bound on the
    steady-state device throughput, not a kernel benchmark.  For the
    clean per-iteration device number use the differential-timing method
    of ``bench.py`` (PERFORMANCE.md "Measurement methodology")."""

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
