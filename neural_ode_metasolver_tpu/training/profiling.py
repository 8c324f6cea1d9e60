"""Profiling: jax.profiler traces replace the reference's ad-hoc wall-time
meters (SURVEY.md §5 — ``RunningAverageMeter`` around the step is kept in
metrics.py; device-level analysis goes through XLA's profiler)."""
from __future__ import annotations

import contextlib

import jax

__all__ = ["trace", "annotate"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a TensorBoard-loadable device trace of the enclosed block.

    Usage::

        with trace("/tmp/profile"):
            ts, m = step(ts, x, y, key)
            jax.block_until_ready(m["loss"])
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the trace timeline."""
    return jax.profiler.TraceAnnotation(name)
