"""Tracing/profiling helpers (SURVEY.md §5 "Tracing / profiling"):
jax.profiler regions around reset/step/learner + env-steps/s counters.
The reference has only a wall-clock runtime metric wrapper; on TPU the
useful signals are xprof traces and sustained env-steps/s."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace_region(name: str):
    """Annotate a host-side region in xprof traces."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def capture_trace(logdir: str):
    """Capture an xprof trace (view with tensorboard-plugin-profile)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Sustained env-steps/s counter. NOTE: call :meth:`lap` only after a
    real host fetch of a value that depends on the step (on tunneled
    backends ``block_until_ready`` does not synchronize)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._steps = 0

    def add(self, env_steps: int):
        self._steps += int(env_steps)

    def lap(self) -> float:
        dt = time.perf_counter() - self._t0
        rate = self._steps / dt if dt > 0 else 0.0
        self.reset()
        return rate
