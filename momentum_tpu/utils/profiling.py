"""Profiling hooks — the MT_PROFILE_* equivalent (common/profile.h:10-130).

The reference selects a tracing backend at compile time (Tracy / XR / no-op);
here the backend is jax.profiler: `profile_scope` annotates named regions in
device traces (StepTraceAnnotation-style), `start_trace`/`stop_trace` wrap
full trace capture for tensorboard/perfetto viewing.
"""

from __future__ import annotations

import contextlib
import os

import jax

__all__ = ["profile_scope", "start_trace", "stop_trace"]


@contextlib.contextmanager
def profile_scope(name: str):
    """Named region visible in jax profiler traces (MT_PROFILE_EVENT)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def start_trace(log_dir: str | None = None):
    log_dir = log_dir or os.environ.get("MOMENTUM_TPU_TRACE_DIR", "/tmp/momentum_tpu_trace")
    jax.profiler.start_trace(log_dir)
    return log_dir


def stop_trace():
    jax.profiler.stop_trace()
