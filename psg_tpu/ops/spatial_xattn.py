"""Fused spatial cross-attention Pallas kernel (VAE decoder hot path).

The decoder's pixel-query/text-key attention (vae_decoder.py:33-65) at
215x215 has L=46,225 queries, C=64/32 channels, 8 heads of dim 8/4, and
S<=256 text keys.  Under plain XLA the fp32 score tensor [B,H,L,S] (~1.5GB
at b8) round-trips HBM through softmax — measured 10-12 ms per site (b8,
scripts/profile_vae.py).  This kernel keeps everything in VMEM per query
block and fuses the whole block body:

    q = x_norm @ Wq + bq                 (the 1x1 Q conv)
    s = (q * scale) @ K_bd + bias        per-head scores in ONE matmul:
                                         K_bd [C, H*S] is block-diagonal
                                         (head h's keys live in rows
                                         h*hd..(h+1)*hd), so q @ K_bd
                                         computes every head's q.k with no
                                         [B,H,L,D] transposes
    p = exp(s - rowmax); p /= p @ seg @ seg.T   segment (per-head) softmax
                                         denominators via a one-hot matmul
    o = p @ V_st                         V_st [H*S, C] block-diagonal again
    out = o @ Wp + bp + residual         (1x1 proj conv + residual)

HBM traffic: read x_norm + residual + write out = 3 activation passes;
scores never leave VMEM.  Grid: (batch, L/TQ query blocks).

Gradients: custom_vjp whose backward differentiates the jnp reference body
(recomputed) — training pays the old price on the backward only; the
serving chain is forward-only.

Stability note on the segment softmax: the max subtracted before exp()
must be PER HEAD.  An earlier revision used the global row max with a
1e-30 denominator floor; once training grew Q/K weights enough that one
head's logits sat ~88 below another head's max, that head's exp()
underflowed fp32 to exact zeros — silently zeroing the head's output in
the forward and, in the backward, dividing by denom^2 = 1e-60 (which
underflows to 0) for a 0/0 = NaN.  This was the round-3 stage-1
"sporadic NaN gradients" root cause (scripts/diag_stage1_nan3.py:
11M/15M/85M non-finite grad elements with the kernel, zero with XLA
attention).  The fix: ``sp`` (the per-head key stride) is rounded up to
the 128-lane tile so each head's score segment is a lane-aligned static
slice, and each segment subtracts its own max — the denominator is then
>= exp(0) = 1 by construction and no floor is needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(xn_ref, res_ref, kbd_ref, vst_ref, bias_ref,
            wq_ref, bq_ref, wp_ref, bp_ref, o_ref, *,
            heads: int, seq: int, scale: float, interpret: bool):
    xn = xn_ref[0]          # [TQ, C]
    res = res_ref[0]
    kbd = kbd_ref[0]        # [C, H*S]
    vst = vst_ref[0]        # [H*S, C]
    bias = bias_ref[0]      # [1, H*S]

    f32 = jnp.float32

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32)

    q = dot(xn, wq_ref[:]) + bq_ref[0].astype(f32)      # [TQ, C] fp32
    s = dot((q * scale).astype(xn.dtype), kbd) + bias.astype(f32)
    # per-head softmax over lane-aligned static slices (seq is a multiple
    # of the 128-lane tile, enforced by the wrapper).  The max MUST be per
    # head: a global row max lets a cold head's exp() underflow to exact
    # zeros (see module docstring).  fp32 softmax: a bf16 exp was measured
    # NO faster (the VPU runs the wide elementwise chain at the same rate).
    parts = []
    for h in range(heads):
        sh = s[:, h * seq:(h + 1) * seq]                 # [TQ, S]
        mh = jnp.max(sh, axis=-1, keepdims=True)
        ph = jnp.exp(sh - mh)
        dh = jnp.sum(ph, axis=-1, keepdims=True)         # >= 1 (max col)
        parts.append(ph / dh)
    p = jnp.concatenate(parts, axis=-1).astype(xn.dtype)  # [TQ, H*S]

    o = dot(p, vst)                                      # [TQ, C] fp32
    out = dot(o.astype(xn.dtype), wp_ref[:]) + bp_ref[0].astype(f32)
    o_ref[0] = (out + res.astype(f32)).astype(o_ref.dtype)


def _ref_impl(xn, res, kbd, vst, bias, wq, bq, wp, bp, *, heads, seq, scale):
    """jnp twin of the kernel body (correctness oracle + backward)."""
    f32 = jnp.float32
    q = jnp.einsum("blc,cd->bld", xn.astype(f32), wq.astype(f32)) + bq
    s = jnp.einsum("blc,bck->blk", (q * scale), kbd.astype(f32)) + bias
    b, l, hs = s.shape
    sh = s.reshape(b, l, heads, seq)
    # per-head max (NOT global): a global max underflows cold heads' exp()
    # to zero and NaNs the backward via denom^-2 — see module docstring
    m = jnp.max(sh, axis=-1, keepdims=True)
    p = jnp.exp(sh - m)
    denom = p.sum(-1, keepdims=True)  # >= 1 (the max column contributes 1)
    p = (p / denom).reshape(b, l, hs)
    o = jnp.einsum("blk,bkc->blc", p, vst.astype(f32))
    out = jnp.einsum("blc,cd->bld", o, wp.astype(f32)) + bp
    return (out + res.astype(f32)).astype(xn.dtype)


def _pallas_impl(xn, res, kbd, vst, bias, wq, bq, wp, bp, *, heads, seq,
                 scale, tq: int = 512, interpret: bool = False):
    b, l, c = xn.shape
    hs = heads * seq
    grid = (b, pl.cdiv(l, tq))
    return pl.pallas_call(
        functools.partial(_kernel, heads=heads, seq=seq, scale=scale,
                          interpret=interpret),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, tq, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, c, hs), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, hs, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, hs), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((c, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((c, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tq, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, l, c), xn.dtype),
        interpret=interpret,
    )(xn, res, kbd, vst, bias, wq, bq, wp, bp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def _fused(xn, res, kbd, vst, bias, wq, bq, wp, bp, heads, seq, scale,
           tq, interpret):
    return _pallas_impl(xn, res, kbd, vst, bias, wq, bq, wp, bp,
                        heads=heads, seq=seq, scale=scale, tq=tq,
                        interpret=interpret)


def _fused_fwd(xn, res, kbd, vst, bias, wq, bq, wp, bp, heads, seq, scale,
               tq, interpret):
    out = _pallas_impl(xn, res, kbd, vst, bias, wq, bq, wp, bp,
                       heads=heads, seq=seq, scale=scale, tq=tq,
                       interpret=interpret)
    return out, (xn, res, kbd, vst, bias, wq, bq, wp, bp)


def _fused_bwd(heads, seq, scale, tq, interpret, saved, g):
    _, vjp = jax.vjp(
        lambda *a: _ref_impl(*a, heads=heads, seq=seq, scale=scale), *saved)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_spatial_xattn(xn, residual, k, v, wq, bq, wp, bp, *,
                        num_heads: int, text_bias=None, scale=None,
                        compat_reshape: bool = False, tq: int = None,
                        interpret: bool = False):
    """Fused GN-free body of the VAE spatial cross-attention block.

    xn/residual: [B, L, C] (x already GroupNorm'd, flattened spatial);
    k, v: [B, S, C] text projections; wq/wp: [C, C] 1x1-conv kernels
    (squeezed); text_bias: [B, 1, 1, S] additive mask or None.
    Returns [B, L, C] = proj(attn) + residual.
    """
    b, l, c = xn.shape
    s = k.shape[1]
    hd = c // num_heads
    if scale is None:
        scale = 1.0 / (hd ** 0.5)

    # per-head segment length rounded to the 128-lane tile: each head's
    # score block is then a lane-aligned static slice inside the kernel
    # (required for the per-head softmax; see module docstring)
    sp = _round_up(max(s, 8), 128)

    # block-diagonal K/V layout: head h occupies channel rows/cols
    # h*hd..(h+1)*hd and key columns h*sp..h*sp+s
    if compat_reshape:
        # reference's raw [B,S,C]->[B,H,hd,S] reshape scramble
        # (vae_decoder.py:55-56): head h, dim d, key s reads the flat
        # element h*hd*S + d*S + s
        kh = k.reshape(b, num_heads, hd, s)                          # [B,H,hd,S]
        vh = v.reshape(b, num_heads, hd, s).transpose(0, 1, 3, 2)    # [B,H,S,hd]
    else:
        kh = k.reshape(b, s, num_heads, hd).transpose(0, 2, 3, 1)    # [B,H,hd,S]
        vh = v.reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)    # [B,H,S,hd]

    kbd = jnp.zeros((b, c, num_heads * sp), k.dtype)
    vst = jnp.zeros((b, num_heads * sp, c), v.dtype)
    bias = jnp.full((b, 1, num_heads * sp), -1e9, jnp.float32)
    key_bias = jnp.zeros((b, s), jnp.float32)
    if text_bias is not None:
        key_bias = text_bias.reshape(b, s).astype(jnp.float32)
    for h in range(num_heads):
        kbd = kbd.at[:, h * hd:(h + 1) * hd, h * sp:h * sp + s].set(kh[:, h])
        vst = vst.at[:, h * sp:h * sp + s, h * hd:(h + 1) * hd].set(vh[:, h])
        bias = bias.at[:, 0, h * sp:h * sp + s].set(key_bias)

    if tq is None:
        import os

        tq = int(os.environ.get("PSG_TPU_SPATIAL_TQ", "1024"))
    tq = min(tq, _round_up(l, 8))
    return _fused(xn, residual, kbd, vst, bias,
                  wq, bq.reshape(1, c), wp, bp.reshape(1, c),
                  num_heads, sp, float(scale), tq, interpret)
