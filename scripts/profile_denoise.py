"""Per-component profile of the stage-2 denoise step on real TPU.

Times each UNet sub-module in isolation (jitted, device-synced) and reports
XLA's own FLOP count per component, so the output is a roofline table: ms,
GFLOP, achieved TFLOP/s, and share of the full forward.

Every repetition gets a DISTINCT input (the axon runtime dedups identical
calls — see .claude/skills/verify/SKILL.md).

Usage:  python scripts/profile_denoise.py [batch]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from psg_tpu.models.unet import (
    UNetSpec,
    attnblock_apply,
    resblock_apply,
    text_bias_from_mask,
    unet_apply,
    unet_init,
    unetblock_apply,
)
from psg_tpu.nn.layers import conv2d
from psg_tpu.nn.resize import bilinear_resize

PEAK_BF16_TFLOPS = 197.0  # v5e chip
N_REPS = 30


def bench(fn, x, n=N_REPS):
    """Time ``fn(x_i)`` over a scan of n DISTINCT stacked inputs — one
    device program, so per-call dispatch latency (milliseconds through the
    axon tunnel) is amortized away and the runtime can't dedup repeats.
    One compile per component (FLOPs come from the same executable / n)."""
    xs = x[None] + jnp.arange(n, dtype=jnp.float32).reshape(
        (n,) + (1,) * x.ndim).astype(x.dtype) * 1e-6

    def body(c, xi):
        out = fn(xi)
        return c + jnp.mean(out.astype(jnp.float32)), None

    f = jax.jit(lambda xs: jax.lax.scan(body, jnp.float32(0.0), xs)[0])
    compiled = f.lower(xs).compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) / n
    except Exception:
        flops = 0.0
    jax.block_until_ready(compiled(xs))
    t0 = time.perf_counter()
    jax.block_until_ready(compiled(xs + jnp.asarray(1e-5, xs.dtype)))
    dt = (time.perf_counter() - t0) / n
    return dt, flops


def main() -> int:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    S = 128
    spec = UNetSpec(text_dim=768, num_heads=4)
    dt_c = jnp.bfloat16

    key = jax.random.PRNGKey(0)
    params = jax.jit(lambda k: unet_init(k, spec))(key)
    jax.block_until_ready(params)

    x = jax.random.normal(key, (batch, 27, 27, 8))
    t = jnp.arange(batch) * 100
    txt = jax.random.normal(key, (batch, S, 768), dt_c)
    mask = jnp.ones((batch, S), jnp.int32)

    full_dt, full_flops = bench(
        lambda xi: unet_apply(params, xi, t, txt, spec, text_mask=mask,
                              dtype=dt_c), x)
    rows = [("FULL forward", full_dt, full_flops)]

    time_emb = jax.random.normal(key, (batch, spec.time_emb_dim), dt_c)
    tp = jnp.mean(txt, axis=1)
    tb = text_bias_from_mask(mask)
    ch = spec.channels
    sp = spec.spatial

    feats = {
        lvl: jax.random.normal(key, (batch, sp[lvl], sp[lvl], ch[lvl]), dt_c)
        for lvl in range(4)
    }

    for lvl in range(4):
        f = feats[lvl]
        blk = params[f"enc{lvl}"][0]
        r_dt, r_fl = bench(
            lambda xi, blk=blk, lvl=lvl: resblock_apply(
                blk["res"], xi, time_emb, tp, cin=ch[lvl], cout=ch[lvl],
                dtype=dt_c), f)
        rows.append((f"resblock L{lvl} {sp[lvl]}^2x{ch[lvl]}", r_dt, r_fl))
        if "attn" in blk:
            a_dt, a_fl = bench(
                lambda xi, blk=blk, lvl=lvl: attnblock_apply(
                    blk["attn"], xi, txt, spec, channels=ch[lvl],
                    text_bias=tb, dtype=dt_c), f)
            rows.append((f"attnblock L{lvl} {sp[lvl]}^2x{ch[lvl]}", a_dt, a_fl))
        dblk = params[f"dec{lvl}"][0]
        f2 = jnp.concatenate([f, f], axis=-1)
        d_dt, d_fl = bench(
            lambda xi, dblk=dblk, lvl=lvl: unetblock_apply(
                dblk, xi, time_emb, tp, txt, spec, cin=2 * ch[lvl],
                cout=ch[lvl], text_bias=tb, dtype=dt_c), f2)
        rows.append((f"decblock  L{lvl} {sp[lvl]}^2x{2*ch[lvl]}->{ch[lvl]}",
                     d_dt, d_fl))

    for lvl in range(1, 4):
        c_dt, c_fl = bench(
            lambda xi, l=lvl: conv2d(params[f"down{l}"], xi, stride=2,
                                     padding=1, dtype=dt_c), feats[lvl - 1])
        rows.append((f"down{lvl} conv s2 {ch[lvl-1]}->{ch[lvl]}", c_dt, c_fl))
        u_dt, u_fl = bench(
            lambda xi, l=lvl: conv2d(
                params[f"up{l}"], bilinear_resize(xi, (sp[l - 1], sp[l - 1])),
                stride=1, padding=1, dtype=dt_c), feats[lvl])
        rows.append((f"up{lvl} resize+conv {ch[lvl]}->{ch[lvl-1]}", u_dt, u_fl))

    print(f"\nbatch={batch} bf16  backend={jax.default_backend()}")
    print(f"{'component':42s} {'ms':>8s} {'GFLOP':>9s} {'TFLOP/s':>8s} "
          f"{'MFU%':>6s} {'frac':>8s}")
    for name, dt, fl in rows:
        tf = fl / dt / 1e12 if dt else 0.0
        frac = dt / full_dt * 100
        print(f"{name:42s} {dt*1e3:8.3f} {fl/1e9:9.2f} {tf:8.1f} "
              f"{tf/PEAK_BF16_TFLOPS*100:6.1f} {frac:7.1f}%")

    print(f"\nfull fwd: {full_dt*1e3:.3f} ms, {full_flops/1e9:.1f} GFLOP, "
          f"MFU {full_flops/full_dt/1e12/PEAK_BF16_TFLOPS*100:.1f}% "
          f"-> {1.0/full_dt:.1f} steps/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
