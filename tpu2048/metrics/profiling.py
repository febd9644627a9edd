"""Tracing / profiling utilities (SURVEY.md §5 "tracing/profiling").

The reference had none (vestigial commented memory_profiler/tracemalloc
imports, mainDQL_CNN_step2.py:15-16). Here:

* :func:`trace` — context manager around ``jax.profiler.trace`` writing a
  TensorBoard-loadable trace directory.
* :func:`annotate` — ``jax.profiler.TraceAnnotation`` for host-side spans;
  inside jitted code use ``jax.named_scope`` (the training drivers name
  their actor/learner scopes so HLO ops group in profiles).
* :func:`time_fn` — block-until-ready timing harness for steps/s numbers
  (the discipline bench.py uses: warmup call, then timed calls on the
  final output).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def _fence(out) -> None:
    """Synchronize on ``out`` with a real host transfer.

    ``jax.block_until_ready`` has been observed returning early on
    tunneled/remote backends (see bench.py); materializing one array leaf
    on the host is the reliable barrier.
    """
    import numpy as np

    jax.block_until_ready(out)
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "shape")]
    if leaves:
        first = leaves[0]
        np.asarray(first[(0,) * first.ndim] if first.ndim else first)


def time_fn(fn: Callable, *args, iters: int = 3, warmup: int = 1, **kw):
    """Run ``fn`` with proper device synchronization; return sec/call."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kw)
    _fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    _fence(out)
    return (time.perf_counter() - t0) / iters
