"""Profiling / tracing utilities (SURVEY §5: the reference has none; we add
step timers + optional jax.profiler traces)."""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional


class StepTimer:
    """Rolling step timer with JSONL export.

    NOTE (axon backend): call sites must force a host readback of a step
    output before stopping the timer — block_until_ready is not a barrier.
    """

    def __init__(self, log_path: Optional[str] = None, window: int = 50):
        self.log_path = log_path
        self.window = window
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, step: int, extra: Optional[Dict] = None):
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        if self.log_path:
            with open(self.log_path, "a") as f:
                rec = {"step": step, "step_time_s": dt, **(extra or {})}
                f.write(json.dumps(rec) + "\n")
        return dt

    @property
    def mean(self):
        return sum(self.times) / max(len(self.times), 1)


@contextlib.contextmanager
def trace(name: str, trace_dir: Optional[str] = None):
    """jax.profiler trace context; no-op when profiling is unsupported
    (e.g. some remote backends)."""
    import jax

    trace_dir = trace_dir or os.environ.get("E4S_TPU_TRACE_DIR")
    if not trace_dir:
        with jax.named_scope(name):
            yield
        return
    try:
        with jax.profiler.trace(trace_dir):
            with jax.named_scope(name):
                yield
    except Exception:
        yield


def start_profiler_server(port: int = 9999) -> bool:
    """Expose the profiler for tensorboard capture; returns False if the
    backend doesn't support it."""
    import jax

    try:
        jax.profiler.start_server(port)
        return True
    except Exception:
        return False
