"""TPU memory planning: the analog of the reference's MPS memory tooling.

The reference ships optimize_mps_memory.py (env tuning + binary-search
allocation/batch-size probes, optimize_mps_memory.py:23-193).  On TPU the
equivalents are: HBM stats from the runtime, a compile-time (AOT) memory
analysis of the actual train step, and a largest-fitting-batch search that
uses AOT analysis instead of trial allocations (no OOM crashes needed).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax

from psg_tpu.utils.profiling import device_memory_stats


def step_memory_analysis(step_fn: Callable, *example_args) -> dict:
    """Compile ``step_fn`` ahead-of-time and report its memory footprint
    without executing it."""
    lowered = jax.jit(step_fn).lower(*example_args)
    compiled = lowered.compile()
    try:
        ma = compiled.memory_analysis()
        return {
            "temp_size_bytes": getattr(ma, "temp_size_in_bytes", None),
            "argument_size_bytes": getattr(ma, "argument_size_in_bytes", None),
            "output_size_bytes": getattr(ma, "output_size_in_bytes", None),
            "generated_code_size_bytes": getattr(
                ma, "generated_code_size_in_bytes", None),
        }
    except Exception:  # backend without memory_analysis
        return {}


def find_max_batch_size(make_args: Callable[[int], tuple], step_fn: Callable,
                        start: int = 1, limit: int = 4096,
                        hbm_bytes: Optional[int] = None,
                        safety: float = 0.9) -> int:
    """Largest batch whose AOT-analyzed footprint fits in HBM.

    ``make_args(batch)`` returns example args (ShapeDtypeStructs are fine).
    Doubles then binary-searches — the reference does the same search by
    actually allocating on MPS (optimize_mps_memory.py:118-193); AOT
    analysis gives the answer without risking the device.
    """
    if hbm_bytes is None:
        hbm_bytes = device_memory_stats().get("bytes_limit") or 16 * 2**30
    budget = hbm_bytes * safety

    def fits(b: int) -> bool:
        try:
            m = step_memory_analysis(step_fn, *make_args(b))
        except Exception:
            return False
        total = sum(v for v in m.values() if isinstance(v, (int, float)))
        return 0 < total <= budget

    if not fits(start):
        return 0
    lo = start
    hi = start
    while hi < limit and fits(hi * 2):
        hi *= 2
    lo, hi = hi, min(hi * 2, limit)
    while lo + 1 < hi:
        mid = (lo + hi) // 2
        if fits(mid):
            lo = mid
        else:
            hi = mid
    return lo
