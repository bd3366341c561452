"""Tracing / profiling hooks.

The reference has none (SURVEY.md §5.1 — only tqdm postfix strings). Here:
``trace_ctx`` wraps jax.profiler traces (view in TensorBoard / Perfetto) and
``step_timer`` measures steady-state step time by forcing a scalar fetch,
which is the only reliable sync on tunnel-backed TPU backends.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace_ctx(logdir: Optional[str]):
    """jax.profiler trace scope; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def step_timer(step_fn: Callable, *args, iters: int = 10,
               warmup: int = 2, fetch: Callable = None) -> float:
    """Seconds per call, steady state. ``fetch(result)`` must pull a scalar
    to host (e.g. lambda r: float(r[1]['loss']))."""
    result = None
    for _ in range(warmup):
        result = step_fn(*args)
    if fetch:
        fetch(result)
    t0 = time.perf_counter()
    for _ in range(iters):
        result = step_fn(*args)
    if fetch:
        fetch(result)
    return (time.perf_counter() - t0) / iters
