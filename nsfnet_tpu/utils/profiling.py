"""Profiling utilities (SURVEY §5.1 parity-plus).

The reference hand-rolls wall-clock counters only; here those counters live
in the solver, and this module adds XLA-level inspection via
jax.profiler.trace for TensorBoard's profile plugin.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """Capture an XLA profiler trace viewable in TensorBoard."""
    import jax

    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def wallclock(label: str, sink=print):
    t0 = time.perf_counter()
    yield
    sink(f"[{label}] {time.perf_counter() - t0:.3f}s")
