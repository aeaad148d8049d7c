"""Tracing/profiling hooks.

The reference has no tracing at all (SURVEY §5; only wall-clock prints,
reference gridsearch.py:324-335). Here every pipeline stage is wrapped in
a named trace annotation, and setting ``ABNET3_PROFILE=<dir>`` captures a
full jax.profiler trace (XLA kernels + host activity, viewable in
TensorBoard / Perfetto) around each annotated stage.
"""

from __future__ import annotations

import contextlib
import os
import time

_TRACE_SEQ = 0

__all__ = ["stage_trace", "profiling_enabled"]


def profiling_enabled() -> bool:
    return bool(os.environ.get("ABNET3_PROFILE"))


@contextlib.contextmanager
def stage_trace(name: str):
    """Context manager: annotates a pipeline stage on the jax profiler
    timeline and, when ABNET3_PROFILE=<dir> is set, writes a standalone
    trace capture for the stage."""
    import jax

    trace_dir = os.environ.get("ABNET3_PROFILE")
    t0 = time.perf_counter()
    if trace_dir:
        # date + a process-wide counter: HHMMSS alone collides when two
        # captures of one stage start in the same second (or a sweep
        # wraps past 24h), silently overwriting the first trace
        global _TRACE_SEQ
        _TRACE_SEQ += 1
        stamp = time.strftime("%Y%m%d-%H%M%S")
        out = os.path.join(trace_dir, f"{name}-{stamp}-{_TRACE_SEQ:03d}")
        os.makedirs(out, exist_ok=True)
        jax.profiler.start_trace(out)
    try:
        with jax.profiler.TraceAnnotation(name):
            yield
    finally:
        if trace_dir:
            jax.profiler.stop_trace()
            print(f"[profile] stage '{name}' trace -> {out} "
                  f"({time.perf_counter() - t0:.2f}s)")
