"""Trustworthy device timing under the axon TPU tunnel.

``jax.block_until_ready`` returns without waiting for device execution on
this platform (verified empirically: a 2048-image train step "completed" in
3 ms by block_until_ready but takes 669 ms wall-clock when its loss value is
actually fetched). The only reliable barrier is fetching a VALUE derived
from the computation. All benchmarks use these helpers.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def value_barrier(out) -> float:
    """Force execution by fetching a scalar reduced from ``out``'s leaves."""
    leaves = jax.tree.leaves(out)
    acc = 0.0
    for leaf in leaves[:1]:  # one leaf suffices: it depends on the whole step
        acc += float(jnp.asarray(leaf).reshape(-1)[0])
    return acc


def timed_loop(step_once: Callable[[object], object], state, *, steps: int,
               warmup: int = 3) -> tuple[float, object]:
    """Run ``state = step_once(state)`` warmup+steps times; barrier via value
    fetch after each phase. Returns (seconds_per_step, final_state)."""
    for _ in range(warmup):
        state = step_once(state)
    value_barrier(state)
    t0 = time.perf_counter()
    for _ in range(steps):
        state = step_once(state)
    value_barrier(state)
    dt = (time.perf_counter() - t0) / steps
    return dt, state


def timed_fn(fn: Callable, *args, steps: int = 10, warmup: int = 3) -> float:
    """Time a stateless jitted fn with value-fetch barriers."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    value_barrier(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    value_barrier(out)
    return (time.perf_counter() - t0) / steps
