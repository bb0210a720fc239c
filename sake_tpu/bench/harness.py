"""Throughput / latency harness and profiler hooks.

Generalizes the reference's ad-hoc timers (``scripts/nbody/speed.py:42-58``
prints sec/forward over 30 jitted calls; ``scripts/motion/speed.py:66-73``
times 100 train steps) into reusable utilities, and adds what the
reference lacked entirely: ``jax.profiler`` trace capture for real
kernel-level attribution.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


def time_fn(fn: Callable, *args, min_seconds: float = 2.0, warmup: int = 1):
    """Wall-clock a jitted callable: returns (sec_per_call, calls)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    n, elapsed = 0, 0.0
    t0 = time.perf_counter()
    while elapsed < min_seconds:
        jax.block_until_ready(fn(*args))
        n += 1
        elapsed = time.perf_counter() - t0
    return elapsed / n, n


def forward_latency(apply_fn, params, *inputs, min_seconds: float = 2.0):
    """sec/forward of a model apply (the nbody speed.py pattern)."""
    fn = jax.jit(apply_fn)
    sec, _ = time_fn(fn, params, *inputs, min_seconds=min_seconds)
    return sec


def train_step_latency(step_fn, state, batch, min_seconds: float = 2.0):
    """sec/step of a (state, batch) -> (state, aux) train step (the motion
    speed.py pattern). Does not donate, so the same state is reusable."""
    fn = jax.jit(step_fn)
    sec, _ = time_fn(fn, state, batch, min_seconds=min_seconds)
    return sec


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/sake_tpu_trace"):
    """Capture a ``jax.profiler`` trace around a block::

        with profile_trace("/tmp/trace"):
            step(state, batch)

    View with TensorBoard or xprof. The reference had no profiling story.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
