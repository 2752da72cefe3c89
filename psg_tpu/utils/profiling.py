"""Tracing / profiling / debug utilities.

Replaces the reference's hand-rolled wall-clock instrumentation
(vae_trainer.py:304-394) with first-class TPU tooling:

- ``trace`` context: jax.profiler trace capture (view in TensorBoard /
  Perfetto);
- ``StepTimer``: per-step device-synchronized timing with percentile
  summary (the honest way to time async dispatch);
- ``debug_nans`` context: the jit-safe analog of the reference's NaN
  scanning (SURVEY.md §5 "race detection / sanitizers") — enables
  ``jax_debug_nans`` so the first non-finite value raises with a
  traceback instead of being silently skipped.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir="profile"):
    """Capture a jax.profiler trace for everything inside the block."""
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


class StepTimer:
    """Times jitted steps with block_until_ready synchronization.

    Repeated IDENTICAL calls can be deduplicated by some runtimes — vary
    an input (e.g. the PRNG key) per repetition when using this for
    microbenchmarks (see .claude/skills/verify/SKILL.md).
    """

    def __init__(self):
        self.samples: List[float] = []

    @contextlib.contextmanager
    def measure(self, result_to_sync=None):
        t0 = time.perf_counter()
        yield
        if result_to_sync is not None:
            jax.block_until_ready(result_to_sync)
        self.samples.append(time.perf_counter() - t0)

    def summary(self) -> dict:
        if not self.samples:
            return {}
        a = np.asarray(self.samples)
        return {
            "mean_s": float(a.mean()),
            "p50_s": float(np.percentile(a, 50)),
            "p90_s": float(np.percentile(a, 90)),
            "steps_per_s": float(1.0 / a.mean()),
            "n": len(a),
        }


def device_memory_stats(device=None) -> dict:
    """HBM usage for a device (TPU/GPU backends expose memory_stats)."""
    d = device or jax.devices()[0]
    stats = d.memory_stats() or {}
    return {
        "bytes_in_use": stats.get("bytes_in_use"),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        "bytes_limit": stats.get("bytes_limit"),
    }
