"""Benchmark and profiling harnesses."""

from sake_tpu.bench.harness import (
    time_fn,
    forward_latency,
    train_step_latency,
    profile_trace,
)

__all__ = ["time_fn", "forward_latency", "train_step_latency", "profile_trace"]
