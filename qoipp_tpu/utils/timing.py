"""Timing & profiling helpers (SURVEY.md §5 "tracing/profiling" analog).

The reference ships steady-clock lambda timers (example/source/timer.hpp:
17-82) and derives MPix/s in its bench (04_bench.cpp:232-233).  Device
timing needs more care: on remoted TPU runtimes a single dispatch+fetch
round trip can cost tens of milliseconds, so `device_time` amortizes the
RTT over n dispatches with one trailing fetch — the pattern that produced
every number in BASELINE.md.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import numpy as np


def enable_compile_cache(path: str = "/tmp/qoipp_tpu_jax_cache") -> None:
    """Point JAX's persistent compilation cache at a shared directory.

    Per-shape XLA compiles of the codec programs take tens of seconds via
    the remoted TPU runtime; every entry point that may compile (tests,
    bench, CLI tools) calls this so shapes compile once per machine."""
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def time_ms(fn: Callable, runs: int = 5, warmup: int = 1) -> float:
    """Host-side wall-clock of fn() in milliseconds (averaged)."""
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(runs):
        fn()
    return (time.perf_counter() - t0) / runs * 1e3


def _fetch(out) -> None:
    """Force materialization through the device transport (block_until_ready
    alone does not synchronize through some remoting layers)."""
    import jax

    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ravel"):
            np.asarray(leaf.ravel()[:1])


def device_time_ms(fn: Callable, *args, runs: int = 10) -> float:
    """RTT-amortized device time of fn(*args) in milliseconds.

    Measures one dispatch+fetch round trip, then `runs` dispatches with a
    single trailing fetch, and subtracts the round trip."""
    out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    out = fn(*args)
    _fetch(out)
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(*args)
    _fetch(out)
    total = time.perf_counter() - t0
    return max(total - rtt, 0.0) / max(runs - 1, 1) * 1e3


def mpix_per_s(n_pixels: int, ms: float) -> float:
    """The bench harness's headline unit (04_bench.cpp:232-233)."""
    return n_pixels / (ms * 1e-3) / 1e6 if ms > 0 else float("inf")


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/qoipp_tpu_trace"):
    """jax.profiler trace context — open the result with TensorBoard or
    Perfetto to see per-op device timelines."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
