"""Profiling: per-stage timing breakdown + optional XLA trace capture.

Reproduces the reference's ``profile`` mode UX: the reference creates its
CL queue with profiling enabled and accumulates per-kernel execution time
from event timestamps, dumped at teardown and ranked by profile.py
(Kernel.cpp:108-116, Context.cpp:90-96, profile.py:9-18,47-53).

On TPU individual "kernels" are fused XLA ops, so the equivalent
granularity is pipeline *stages* (luma extract+normalize, forward, swap,
train step, ...). ``StageProfiler`` times stages with
``block_until_ready`` walls and prints the same ranked percent breakdown.
Set ``profile_dir`` to also capture a ``jax.profiler`` trace for op-level
analysis in TensorBoard/Perfetto (the deep equivalent of the per-kernel
timestamps).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Optional

import jax


class StageProfiler:
    """Accumulates wall time per named stage; prints a ranked breakdown."""

    def __init__(self, enabled: bool = True, profile_dir: Optional[str] = None):
        self.enabled = enabled
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self._trace_dir = profile_dir
        self._tracing = False

    def start_trace(self):
        if self._trace_dir and not self._tracing:
            jax.profiler.start_trace(self._trace_dir)
            self._tracing = True

    def stop_trace(self):
        if self._tracing:
            jax.profiler.stop_trace()
            self._tracing = False

    @contextlib.contextmanager
    def stage(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def timed(self, name: str, fn, *args, **kwargs):
        """Run ``fn`` and block on its output under stage ``name``."""
        if not self.enabled:
            return fn(*args, **kwargs)
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        out = jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1
        return out

    def report(self, log=print):
        """Ranked per-stage share, like profile.py's kernel breakdown."""
        if not self.enabled or not self.totals:
            return
        total = sum(self.totals.values())
        log("---- stage profile ----")
        for name, t in sorted(self.totals.items(), key=lambda kv: kv[1]):
            log(
                f"{t:8.4f}s ({t * 100 / total:5.2f}%) x{self.counts[name]:<5d} - {name}"
            )
        log(f"Total measured time: {total:.4f}s")


def print_device_memory(log=print):
    """Per-device memory accounting — the TPU analog of the reference's
    Context::print_app_memory_usage (Context.cpp:132-149)."""
    import jax

    for d in jax.local_devices():
        stats = None
        try:
            stats = d.memory_stats()
        except Exception:
            pass
        if not stats:
            log(f"[{d}] memory stats unavailable")
            continue
        in_use = stats.get("bytes_in_use", 0)
        peak = stats.get("peak_bytes_in_use", 0)
        limit = stats.get("bytes_limit", 0)
        log(
            f"[{d}] device memory: {in_use / 1e6:.1f} MB in use, "
            f"peak {peak / 1e6:.1f} MB"
            + (f", limit {limit / 1e6:.1f} MB" if limit else "")
        )
