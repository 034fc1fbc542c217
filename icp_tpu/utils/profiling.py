"""Profiling hooks and roofline accounting.

The reference's only timing is wall-clock in the driver and bench
(SURVEY §5).  Here: a thin context manager around the JAX profiler (traces
viewable in TensorBoard/Perfetto), wall-clock timers that block on device
work, and first-principles roofline estimates for the correspondence kernel
so measured times can be judged against speed-of-light.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace("/tmp/jax-trace"):`` — capture a device profile."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class Timing:
    seconds: float
    runs: int

    @property
    def per_run(self) -> float:
        return self.seconds / max(self.runs, 1)


def time_fn(fn, *args, runs: int = 10, warmup: int = 1) -> Timing:
    """Wall-clock a jitted function, blocking on device completion."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    if out is not None:
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(*args)
    jax.block_until_ready(out)
    return Timing(time.perf_counter() - t0, runs)


def nn_roofline(n: int, m: int, dim: int, batch: int = 1, dtype_bytes: int = 4) -> dict:
    """FLOPs / bytes / arithmetic intensity of the fused NN correspondence.

    Per (query, target) pair: ``dim`` subtracts + ``dim`` multiplies +
    ``dim-1`` adds, plus the running min/argmin compare-select (~2 ops).
    Fused (no (N, M) materialization), bytes = inputs + outputs only.
    """
    flops = batch * n * m * (3 * dim + 1)
    bytes_accessed = batch * dtype_bytes * (n * dim + m * dim + 2 * n)
    return {
        "flops": flops,
        "bytes": bytes_accessed,
        "intensity_flops_per_byte": flops / bytes_accessed,
    }
