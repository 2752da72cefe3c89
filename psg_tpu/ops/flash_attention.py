"""Pallas TPU flash attention for short-KV workloads.

Every attention in this framework has short keys/values (text K/V <= 256
tokens; UNet self-attention <= 196 latent positions) but queries up to
46,225 pixels (the VAE decoder's 215x215 cross-attention,
vae_decoder.py:161-166).  Materializing the [46k, S] score matrix in HBM is
what makes that block slow under naive lowering (B=8, H=8 heads -> ~1.5 GB
of fp32 scores per layer).

Kernel shape: grid over (batch*heads, query blocks); K/V for the (b,h) pair
stay resident in VMEM while each TQ-row query block computes
softmax(QK^T)V entirely on-chip — scores never touch HBM.  KV is short, so
no online-softmax rescaling is needed: one stable fp32 softmax per block.

Padding contract (host side, in ``flash_sdpa``): D and Lk are padded to
lane multiples; padded keys get -1e9 bias, padded D columns are zero so
they contribute nothing; padded query rows compute garbage that is sliced
off.  Falls back to the XLA reference for bias shapes the kernel doesn't
model (e.g. causal masks) — dispatch happens in psg_tpu.ops.sdpa.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[0]  # [TQ, D]
    k = k_ref[0]  # [Lk, D]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TQ, Lk]
    s = s * scale + bias_ref[0].astype(jnp.float32)  # [1, Lk] broadcasts over TQ
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _supported_bias(bias, b, h, lq, lk) -> bool:
    """The kernel models per-key additive bias broadcast over heads and
    queries ([B,1,1,Lk]); anything else falls back to XLA."""
    if bias is None:
        return True
    return bias.ndim == 4 and bias.shape[1] == 1 and bias.shape[2] == 1


def _flash_impl(q, k, v, key_bias, scale):
    # NOTE: deliberately not wrapped in its own jax.jit — callers are always
    # under jit already, and keeping this inline means pallas lowering
    # errors surface at trace time where ops.sdpa's XLA fallback can catch
    # them.
    b, h, lq, d = q.shape
    lk = k.shape[2]
    dtype = q.dtype

    # Tile legality: the last block dim must be 128-divisible OR equal to
    # the full array dim — so leave D unpadded (padding 64->128 would double
    # q/out HBM traffic, and D==full-dim blocks are legal at any size).
    dp = d
    lkp = _round_up(lk, 128)
    tq = 1024 if lq >= 1024 else (512 if lq >= 512 else _round_up(lq, 8))
    lqp = _round_up(lq, tq)

    qp = jnp.zeros((b * h, lqp, dp), dtype).at[:, :lq, :d].set(
        q.reshape(b * h, lq, d))
    kp = jnp.zeros((b * h, lkp, dp), dtype).at[:, :lk, :d].set(
        k.reshape(b * h, lk, d))
    vp = jnp.zeros((b * h, lkp, dp), dtype).at[:, :lk, :d].set(
        v.reshape(b * h, lk, d))

    # per-key bias [B*H, 1, Lkp]: -1e9 on padded keys (+ user mask); the
    # singleton row dim keeps the block shape tile-legal on TPU
    neg = jnp.full((b, lkp), -1e9, jnp.float32).at[:, :lk].set(
        key_bias if key_bias is not None else jnp.zeros((b, lk), jnp.float32))
    biasp = jnp.repeat(neg, h, axis=0)[:, None, :]  # [B*H, 1, Lkp]

    grid = (b * h, lqp // tq)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, dp), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, lkp, dp), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, lkp, dp), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, lkp), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tq, dp), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, lqp, dp), dtype),
    )(qp, kp, vp, biasp)

    return out[:, :lq, :d].reshape(b, h, lq, d)


def flash_sdpa(q, k, v, *, bias=None, scale=None):
    """Drop-in for ops.sdpa_xla on TPU; raises for unsupported bias shapes
    (caller falls back to XLA)."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if not _supported_bias(bias, b, h, lq, lk):
        raise NotImplementedError("flash_sdpa: unsupported bias shape")
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    key_bias = None
    if bias is not None:
        key_bias = bias.reshape(b, lk).astype(jnp.float32)
    return _flash_impl(q, k, v, key_bias, float(scale))
