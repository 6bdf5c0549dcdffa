"""Profiling / tracing hooks (SURVEY.md section 5: absent in the reference).

``trace_to(dir)`` wraps ``jax.profiler`` and writes an xplane/perfetto trace
usable in TensorBoard or ui.perfetto.dev; ``scope(name)`` is a
``jax.named_scope`` alias so kernels show up with meaningful names.
"""

from __future__ import annotations

import contextlib
import time

import jax


def scope(name: str):
    """Named scope for profiler visibility of pipeline stages."""
    return jax.named_scope(name)


@contextlib.contextmanager
def trace_to(log_dir: str):
    """Capture a jax.profiler trace of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(record: dict, key: str):
    """Wall-clock timing of a (blocking) block into ``record[key]`` (sec)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        record[key] = time.perf_counter() - t0
