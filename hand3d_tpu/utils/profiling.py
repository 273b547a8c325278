"""Profiling / tracing helpers.

The reference had no profiling support at all (SURVEY.md §5 — wall-of-print
only). Here:
  * ``trace(logdir)`` wraps jax.profiler for XLA/TPU traces viewable in
    TensorBoard/Perfetto;
  * ``StageTimer`` measures jitted callables with proper device
    synchronization (dispatch is async; naive wall-clock timing without
    blocking measures nothing).
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir):
    """Capture a device trace: ``with trace('/tmp/trace'): step(...)``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Times jitted functions with block_until_ready around each call."""

    def __init__(self, warmup=2, iters=5):
        self.warmup = warmup
        self.iters = iters
        self.results = {}

    def measure(self, name, fn, *args, **kwargs):
        """Returns median seconds per call; records into self.results."""
        for _ in range(self.warmup):
            jax.block_until_ready(fn(*args, **kwargs))
        times = []
        for _ in range(self.iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args, **kwargs))
            times.append(time.perf_counter() - t0)
        times.sort()
        median = times[len(times) // 2]
        self.results[name] = median
        return median

    def report(self, log=print):
        total = sum(self.results.values())
        for name, t in sorted(self.results.items(), key=lambda kv: -kv[1]):
            log(f"{name:32s} {t * 1e3:8.2f} ms  {t / total * 100:5.1f}%")
        log(f"{'total':32s} {total * 1e3:8.2f} ms")
