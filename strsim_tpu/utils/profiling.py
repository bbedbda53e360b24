"""Tracing / profiling hooks.

The reference has none (SURVEY.md §5). Here: a context manager around
jax.profiler for device traces viewable in TensorBoard/XProf, and a tiny
annotation helper for host phases so encode/classify/finalize show up on the
same timeline as kernel launches.
"""
from __future__ import annotations

import contextlib
from typing import Iterator, Optional


@contextlib.contextmanager
def device_trace(log_dir: str, host_tracer_level: int = 2) -> Iterator[None]:
    """Capture a jax.profiler trace of everything inside the block.

        with device_trace("/tmp/strsim-trace"):
            engine.compute_many(measures, a, b)

    View with: tensorboard --logdir /tmp/strsim-trace (Profile tab).
    """
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named host-side span (TraceAnnotation) inside a device_trace capture."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
