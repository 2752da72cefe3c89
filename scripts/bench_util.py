"""Shared microbenchmark helper for the profiling scripts.

Times fn(x) over an on-device lax.scan of n DISTINCT inputs: one program,
so per-call dispatch latency (milliseconds through the axon tunnel) is
amortized and the runtime cannot dedup repeats.  FLOPs come from the same
compiled executable (XLA cost analysis) divided by n.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

PEAK_BF16_TFLOPS = 197.0  # v5e chip


def bench(fn, x, n: int = 30, params=None):
    """fn(params, x_i) when params is given, else fn(x_i).  Params ride as a
    jit ARGUMENT — closing over big trees bakes GBs of constants into the
    program (remote-compile killer, see .claude/skills/verify/SKILL.md)."""
    xs = x[None] + jnp.arange(n, dtype=jnp.float32).reshape(
        (n,) + (1,) * x.ndim).astype(x.dtype) * 1e-6

    def scan_fn(p, xs):
        def body(c, xi):
            out = fn(p, xi) if params is not None else fn(xi)
            return c + jnp.mean(out.astype(jnp.float32)), None

        return jax.lax.scan(body, jnp.float32(0.0), xs)[0]

    f = jax.jit(lambda p, xs: scan_fn(p, xs))
    compiled = f.lower(params, xs).compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        # XLA counts the scan body ONCE in cost analysis, so no /n here
        flops = float(ca.get("flops", 0.0))
        if flops > 0 and n > 1:
            # heuristics: some backends do report the unrolled total
            pass
    except Exception:
        flops = 0.0
    # pipeline several distinct device-resident calls so the tunnel's
    # per-call round-trip latency amortizes (bench.py methodology)
    reps = 4
    variants = [xs + jnp.asarray(i * 1e-6, xs.dtype) for i in range(reps)]
    jax.block_until_ready(variants)
    jax.block_until_ready(compiled(params, variants[0]))
    t0 = time.perf_counter()
    outs = [compiled(params, v) for v in variants]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / (reps * n)
    return dt, flops


def report(name, dt, flops, total_dt=None):
    tf = flops / dt / 1e12 if dt else 0.0
    frac = f"{dt / total_dt * 100:7.1f}%" if total_dt else "       "
    print(f"{name:44s} {dt*1e3:8.3f}ms {flops/1e9:9.2f}GF {tf:7.1f}TF/s "
          f"{tf/PEAK_BF16_TFLOPS*100:5.1f}% {frac}", flush=True)
