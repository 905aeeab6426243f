"""Profiling: jax.profiler traces + named scopes around the hot phases.

The reference's only instrumentation is ``jax.debug.print`` tags inside
jitted controllers (``pds_controllers_agents.py:20,45,100``; SURVEY.md §5
"Tracing/profiling: none"). Here: context managers that wrap phases in
XLA-visible named scopes and dump device traces viewable in TensorBoard /
Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def trace_annotation(name: str) -> Iterator[None]:
    """Named scope visible in device traces (TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile_to(log_dir: str) -> Iterator[None]:
    """Capture a device trace for the enclosed block into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def profile_scope(name: str, *, sync: bool = False) -> Iterator[dict]:
    """Host-side wall-clock scope; fills the yielded dict with ``seconds``.

    ``sync=True`` blocks on all live arrays first so the measurement doesn't
    include previously enqueued work.
    """
    if sync:
        (jax.device_put(0.0) + 0).block_until_ready()
    out: dict = {}
    t0 = time.perf_counter()
    try:
        yield out
    finally:
        out["seconds"] = time.perf_counter() - t0
