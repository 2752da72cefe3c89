"""Per-component profile of the stage-2 denoise step on real TPU.

Times each UNet sub-module in isolation (on-device scan over distinct
inputs — dispatch-latency- and dedup-proof, see scripts/bench_util.py) and
reports XLA's own FLOP count per component: ms, GFLOP, achieved TFLOP/s,
MFU, and share of the full forward.

Usage:  python -u scripts/profile_denoise.py [batch] [comp1,comp2,...]
        components: res0..3, attn1..3, dec0..3, down1..3, up1..3
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp

from bench_util import PEAK_BF16_TFLOPS, bench
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

    def report(name, dt, fl, full_dt=None):
        tf = fl / dt / 1e12 if dt else 0.0
        frac = f"{dt / full_dt * 100:7.1f}%" if full_dt else "       "
        print(f"{name:42s} {dt*1e3:8.3f} {fl/1e9:9.2f} {tf:8.1f} "
              f"{tf/PEAK_BF16_TFLOPS*100:6.1f} {frac}", flush=True)

    print(f"batch={batch} bf16  backend={jax.default_backend()}", flush=True)
    print(f"{'component':42s} {'ms':>8s} {'GFLOP':>9s} {'TFLOP/s':>8s} "
          f"{'MFU%':>6s} {'frac':>8s}", flush=True)

    full_dt, full_flops = bench(
        lambda p, xi: unet_apply(p, xi, t, txt, spec, text_mask=mask,
                                 dtype=dt_c), x, params=params)
    report("FULL forward", full_dt, full_flops)

    time_emb = jax.random.normal(key, (batch, spec.time_emb_dim), dt_c)
    tp = jnp.mean(txt, axis=1)
    tb = text_bias_from_mask(mask)
    ch = spec.channels
    sp = spec.spatial

    feats = {
        lvl: jax.random.normal(key, (batch, sp[lvl], sp[lvl], ch[lvl]), dt_c)
        for lvl in range(4)
    }
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else {
        "res1", "attn1", "dec1", "attn2", "res2", "up1"}

    for lvl in range(4):
        f = feats[lvl]
        blk = params[f"enc{lvl}"][0]
        if f"res{lvl}" in only:
            r_dt, r_fl = bench(
                lambda p, xi, lvl=lvl: resblock_apply(
                    p["res"], xi, time_emb, tp, cin=ch[lvl], cout=ch[lvl],
                    dtype=dt_c), f, params=blk)
            report(f"resblock L{lvl} {sp[lvl]}^2x{ch[lvl]}", r_dt, r_fl, full_dt)
        if "attn" in blk and f"attn{lvl}" in only:
            a_dt, a_fl = bench(
                lambda p, xi, lvl=lvl: attnblock_apply(
                    p["attn"], xi, txt, spec, channels=ch[lvl],
                    text_bias=tb, dtype=dt_c), f, params=blk)
            report(f"attnblock L{lvl} {sp[lvl]}^2x{ch[lvl]}", a_dt, a_fl, full_dt)
        if f"dec{lvl}" in only:
            dblk = params[f"dec{lvl}"][0]
            f2 = jnp.concatenate([f, f], axis=-1)
            d_dt, d_fl = bench(
                lambda p, xi, lvl=lvl: unetblock_apply(
                    p, xi, time_emb, tp, txt, spec, cin=2 * ch[lvl],
                    cout=ch[lvl], text_bias=tb, dtype=dt_c), f2, params=dblk)
            report(f"decblock  L{lvl} {sp[lvl]}^2x{2*ch[lvl]}->{ch[lvl]}",
                   d_dt, d_fl, full_dt)

    for lvl in range(1, 4):
        if f"down{lvl}" in only:
            c_dt, c_fl = bench(
                lambda p, xi: conv2d(p, xi, stride=2, padding=1, dtype=dt_c),
                feats[lvl - 1], params=params[f"down{lvl}"])
            report(f"down{lvl} conv s2 {ch[lvl-1]}->{ch[lvl]}", c_dt, c_fl, full_dt)
        if f"up{lvl}" in only:
            u_dt, u_fl = bench(
                lambda p, xi, l=lvl: conv2d(
                    p, bilinear_resize(xi, (sp[l - 1], sp[l - 1])),
                    stride=1, padding=1, dtype=dt_c),
                feats[lvl], params=params[f"up{lvl}"])
            report(f"up{lvl} resize+conv {ch[lvl]}->{ch[lvl-1]}", u_dt, u_fl, full_dt)

    print(f"\nfull fwd: {full_dt*1e3:.3f} ms, {full_flops/1e9:.1f} GFLOP, "
          f"MFU {full_flops/full_dt/1e12/PEAK_BF16_TFLOPS*100:.1f}% "
          f"-> {1.0/full_dt:.1f} steps/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
