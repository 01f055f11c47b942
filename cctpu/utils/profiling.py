"""Tracing/profiling hooks (SURVEY.md §5: reference has wall-clock
bracketing only; here: phase timers + optional jax.profiler traces)."""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Optional


class PhaseTimer:
    """Accumulating named phase timer (the reference's time.time()
    bracketing, structured)."""

    def __init__(self):
        self.phases: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + time.time() - t0

    def report(self, log=print):
        total = sum(self.phases.values())
        for k, v in sorted(self.phases.items(), key=lambda kv: -kv[1]):
            log(f"  {k:28s} {v:8.2f} s  ({100 * v / max(total, 1e-9):4.1f}%)")
        log(f"  {'total':28s} {total:8.2f} s")


@contextlib.contextmanager
def jax_trace(out_dir: Optional[str] = None):
    """Capture a jax.profiler trace when CCTPU_TRACE_DIR (or out_dir) is
    set; no-op otherwise."""
    out_dir = out_dir or os.environ.get("CCTPU_TRACE_DIR")
    if not out_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def nan_guard(enable: bool = True):
    """Enable jax NaN debugging (SURVEY §5 'race detection' analog —
    determinism + numeric guards)."""
    import jax
    jax.config.update("jax_debug_nans", enable)
