"""Tracing / profiling utilities.

Reference analogs: stage timers with explicit device sync around every train
phase (``cpc/Train.cpp:1131-1140``), ``TimeElapsedReporter`` scope timers in
the inference examples (``examples/Util.{h,cpp}``), ArrayFire memory-manager
stat dumps at checkpoints (``Train.cpp:713-717``).

TPU equivalents: ``jax.profiler`` trace capture (XLA op-level timeline),
scope timers with ``block_until_ready`` barriers, and device memory stats.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Optional

import jax


class TimeElapsedReporter:
    """Scope timer printing '<name> took Xms' (reference Util.h)."""

    def __init__(self, name: str, sync: Any = None, quiet: bool = False):
        self.name = name
        self.sync = sync
        self.quiet = quiet
        self.elapsed_ms: Optional[float] = None

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *a):
        if self.sync is not None:
            jax.block_until_ready(self.sync)
        self.elapsed_ms = 1000.0 * (time.perf_counter() - self.t0)
        if not self.quiet:
            print(f"[{self.name}] took {self.elapsed_ms:.1f} ms", flush=True)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    """Per-device memory stats in MB (the ArrayFire stats-dump analog)."""
    out = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
        except Exception:
            continue
        if s:
            out[str(d)] = {
                "bytes_in_use_mb": s.get("bytes_in_use", 0) / 1e6,
                "peak_bytes_mb": s.get("peak_bytes_in_use", 0) / 1e6,
                "bytes_limit_mb": s.get("bytes_limit", 0) / 1e6,
            }
    return out


def log_compile_cost(jitted, *args) -> Dict[str, float]:
    """FLOPs/bytes estimates from XLA cost analysis for a jitted fn."""
    c = jitted.lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return {
        "flops": float(ca.get("flops", 0.0)),
        "bytes_accessed": float(ca.get("bytes accessed", 0.0)),
    }
