"""Profiling helpers: jax.profiler traces and honest device timing.

``block_until_ready`` returns at *dispatch* on tunneled platforms (axon), so
``device_time`` forces completion with a device-side reduction fetched to the
host — the only reliable wall-clock device timing in this environment.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a jax.profiler trace (view with TensorBoard/Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _force(x) -> float:
    leaves = jax.tree_util.tree_leaves(x)
    acc = 0.0
    for leaf in leaves:
        if hasattr(leaf, "dtype"):
            acc += float(jnp.sum(leaf.astype(jnp.float32)))
    return acc


def device_time(fn: Callable, *args, reps: int = 4, warmup: int = 1) -> float:
    """Median-free average seconds per call with forced completion."""
    for _ in range(warmup):
        _force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        _force(fn(*args))
    return (time.perf_counter() - t0) / reps


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Trap NaNs at their producing op (the reference scrubs NaN/Inf ad hoc —
    SURVEY §2.4.13; use this in tests to find the source instead)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
