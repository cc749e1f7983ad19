"""Tracing / profiling helpers (SURVEY.md §5: the reference has none;
the TPU build provides jax.profiler annotations + perfetto dumps around
the benchmark harness).
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp

__all__ = ["annotate", "trace_to", "device_timer"]


def annotate(name: str):
    """Named trace annotation usable as decorator or context manager —
    shows up in perfetto/tensorboard profiles."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def trace_to(logdir: str) -> Iterator[None]:
    """Capture a profiler trace (perfetto/tensorboard format) around a
    block of device work."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def device_timer(label: str = "", sink: Optional[list] = None):
    """Honest wall-clock timer for device work.

    Forces a scalar round-trip on exit: ``block_until_ready`` alone can
    under-report through remote-execution relays (observed on the axon
    TPU tunnel), so the timed region must end with a value fetch. Use::

        with device_timer("solve") as t:
            out = fn(x)
            t.result = out      # timer drains this on exit
    """

    class _T:
        result = None
        elapsed = None

    t = _T()
    t0 = time.perf_counter()
    try:
        yield t
    finally:
        if t.result is not None:
            leaves = jax.tree.leaves(t.result)
            if leaves:
                jnp.asarray(leaves[0]).ravel()[:1].block_until_ready()
                float(jnp.sum(leaves[0].ravel()[:1]))
        t.elapsed = time.perf_counter() - t0
        if sink is not None:
            sink.append((label, t.elapsed))
