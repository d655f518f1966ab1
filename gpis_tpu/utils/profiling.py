"""Tracing / profiling hooks (SURVEY.md §6: reference had only ROS_INFO
timing prints; rebuild wraps fit/query in `jax.profiler.trace` and provides
block-until-ready wall-clock timers feeding the bench harness)."""

from __future__ import annotations

import contextlib
import json
import time

import jax

__all__ = ["Timer", "timed", "trace", "device_sync"]


def device_sync(x):
    """Block until all device work producing x is done (accurate timing)."""
    return jax.block_until_ready(x)


class Timer:
    """Accumulates named wall-clock stages; emits machine-readable JSON."""

    def __init__(self):
        self.stages: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + time.perf_counter() - t0

    def json(self) -> str:
        return json.dumps({k: round(v, 6) for k, v in self.stages.items()})


@contextlib.contextmanager
def timed(label: str, out: dict | None = None):
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if out is not None:
        out[label] = dt


@contextlib.contextmanager
def trace(log_dir: str | None):
    """jax.profiler trace (Perfetto/XProf) when log_dir is set; no-op otherwise."""
    if log_dir:
        with jax.profiler.trace(log_dir):
            yield
    else:
        yield
