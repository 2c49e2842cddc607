"""Profiling / timing helpers (the reference has none — SURVEY.md §5: ad-hoc
``time()`` prints only).

- :func:`trace` — context manager around ``jax.profiler`` producing a
  Perfetto/XPlane trace directory (view with tensorboard or ui.perfetto.dev).
- :func:`timed` — wall-clock timing that actually synchronizes: through the
  axon TPU relay ``block_until_ready`` can return early, so completion is
  forced by a scalar readback of every array leaf.
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Tuple


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace('/tmp/trace'): run_step()`` -> XPlane/Perfetto trace."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(tree) -> float:
    """Force device completion by reading one scalar per array leaf; returns
    the sum (so the value is observably used)."""
    import jax
    import jax.numpy as jnp

    total = 0.0
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "ravel"):
            total += float(jnp.asarray(leaf).ravel()[0])
    return total


def timed(fn: Callable, *args, iters: int = 3, warmup: int = 1, **kwargs) -> Tuple[float, Any]:
    """(best seconds per call, last output). Synchronizes via :func:`sync`."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
        sync(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out
