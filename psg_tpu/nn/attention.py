"""Attention modules.

Two flavors, mirroring the reference's two attention families:

1. ``mha`` — equivalent of ``torch.nn.MultiheadAttention(batch_first=True)``
   (fused in-projection + out-projection), used by the UNet's
   CrossAttentionBlock for both self- and cross-attention
   (reference: src/models/unet.py:160-173).

2. ``spatial_cross_attention`` — the VAE decoder's pixel-query / text-key
   attention block: GroupNorm -> 1x1-conv Q -> Linear K/V -> attention ->
   1x1-conv proj -> residual (reference: src/models/vae_decoder.py:33-65).

Both route the core softmax(QK^T)V through ``psg_tpu.ops.sdpa`` so the
Pallas TPU kernel is picked up automatically.

Note on ``compat_reshape``: the reference reshapes the K/V projections of
shape [B, S, C] directly to [B, heads, head_dim, S]
(vae_decoder.py:55-56), which in row-major memory *scrambles* the sequence
and channel axes rather than transposing them.  Networks trained with the
reference learned through that fixed permutation, so for importing reference
checkpoints we reproduce it bit-for-bit behind ``compat_reshape=True``; the
default is the conventional (correct) head split.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from psg_tpu import ops
from psg_tpu.nn import init as wi
from psg_tpu.nn.layers import (
    conv2d,
    conv2d_init,
    group_norm,
    group_norm_init,
    linear,
    linear_init,
)

# ---------------------------------------------------------------------------
# torch-style fused MultiheadAttention
# ---------------------------------------------------------------------------


def mha_init(key, dim: int, *, gain: Optional[float] = None, dtype=jnp.float32):
    """Params of nn.MultiheadAttention: fused in_proj (q|k|v) + out_proj.

    torch initializes in_proj_weight with xavier_uniform_ (gain 1) and
    out_proj with the Linear default; biases zero for in_proj, default for
    out_proj.  We match that family (exact init parity is irrelevant for
    from-scratch training).
    """
    k1, k2 = jax.random.split(key)
    in_w = wi.xavier_uniform(k1, (dim, 3 * dim), dtype, gain=gain or 1.0)
    return {
        "in_proj": {"w": in_w, "b": jnp.zeros((3 * dim,), dtype)},
        "out_proj": linear_init(k2, dim, dim, init="torch", dtype=dtype),
    }


def mha(params, q_in, kv_in, num_heads: int, *, bias=None, dtype=None,
        dropout_rate: float = 0.0, dropout_key=None):
    """Multi-head attention, batch-first.

    q_in: [B, Lq, C]; kv_in: [B, Lk, C]. Returns [B, Lq, C].
    ``bias`` is an additive attention bias broadcastable to [B,H,Lq,Lk]
    (use -1e9 on padded keys).
    """
    b, lq, c = q_in.shape
    lk = kv_in.shape[1]
    hd = c // num_heads

    w = params["in_proj"]["w"]
    bb = params["in_proj"]["b"]
    if dtype is not None:
        q_in, kv_in, w = q_in.astype(dtype), kv_in.astype(dtype), w.astype(dtype)
    # NOTE: a fused [C,3C] self-attention matmul was benchmarked in-chain
    # and was not faster than three slices on v5e (236 vs 241 steps/s) —
    # XLA already batches these; keeping the simpler form.
    wq, wk, wv = w[:, :c], w[:, c : 2 * c], w[:, 2 * c :]
    bq, bk, bv = bb[:c], bb[c : 2 * c], bb[2 * c :]

    q = jnp.dot(q_in, wq, preferred_element_type=jnp.float32) + bq
    k = jnp.dot(kv_in, wk, preferred_element_type=jnp.float32) + bk
    v = jnp.dot(kv_in, wv, preferred_element_type=jnp.float32) + bv
    if dtype is not None:
        q, k, v = q.astype(dtype), k.astype(dtype), v.astype(dtype)

    q = q.reshape(b, lq, num_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, lk, num_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, lk, num_heads, hd).transpose(0, 2, 1, 3)

    out = ops.sdpa(q, k, v, bias=bias)

    if dropout_rate > 0.0 and dropout_key is not None:
        keep = jax.random.bernoulli(dropout_key, 1.0 - dropout_rate, out.shape)
        out = jnp.where(keep, out / (1.0 - dropout_rate), 0.0).astype(out.dtype)

    out = out.transpose(0, 2, 1, 3).reshape(b, lq, c)
    return linear(params["out_proj"], out, dtype=dtype)


# ---------------------------------------------------------------------------
# VAE spatial cross-attention block
# ---------------------------------------------------------------------------


def spatial_cross_attention_init(key, channels: int, text_dim: int,
                                 dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    return {
        "norm": group_norm_init(channels, dtype),
        "q": conv2d_init(ks[0], channels, channels, 1, init="torch", dtype=dtype),
        "k": linear_init(ks[1], text_dim, channels, init="torch", dtype=dtype),
        "v": linear_init(ks[2], text_dim, channels, init="torch", dtype=dtype),
        "proj": conv2d_init(ks[3], channels, channels, 1, init="torch", dtype=dtype),
    }


def _use_fused_spatial(l: int, c: int, num_heads: int) -> bool:
    """Fused Pallas path for the big pixel-query sites (108^2/215^2, where
    XLA's HBM-resident score tensors cost 2.7-12 ms, scripts/profile_vae.py);
    small sites stay on XLA which fuses them well enough."""
    import os

    force = os.environ.get("PSG_TPU_SPATIAL_ATTN", "").lower()
    if force == "xla":
        return False
    import jax as _jax

    on_tpu = _jax.default_backend() == "tpu"
    if force == "pallas":
        return on_tpu
    return on_tpu and l >= 4096 and c % num_heads == 0


def spatial_cross_attention(params, x, text_emb, num_heads: int = 8, *,
                            text_bias=None, dtype=None,
                            compat_reshape: bool = False):
    """Pixel-query text-key cross-attention with residual.

    x: [B, H, W, C]; text_emb: [B, S, text_dim]. Returns [B, H, W, C].
    ``text_bias``: additive [B, 1, 1, S] mask bias for padded text tokens
    (None reproduces the reference, which attends to padding).
    """
    b, h, w, c = x.shape
    s = text_emb.shape[1]
    hd = c // num_heads
    residual = x

    from psg_tpu.nn.layers import largest_group_count

    # GroupNorm(32) at reference widths; divisor rule for scaled widths
    xn = group_norm(params["norm"], x, num_groups=largest_group_count(c),
                    eps=1e-5)
    k = linear(params["k"], text_emb, dtype=dtype)  # [B,S,C]
    v = linear(params["v"], text_emb, dtype=dtype)

    if _use_fused_spatial(h * w, c, num_heads):
        from psg_tpu.ops.spatial_xattn import fused_spatial_xattn

        wq = params["q"]["w"].reshape(c, c)
        wp = params["proj"]["w"].reshape(c, c)
        if dtype is not None:
            xn = xn.astype(dtype)
            wq, wp = wq.astype(dtype), wp.astype(dtype)
        out = fused_spatial_xattn(
            xn.reshape(b, h * w, c), residual.reshape(b, h * w, c),
            k, v, wq, params["q"]["b"], wp, params["proj"]["b"],
            num_heads=num_heads, text_bias=text_bias,
            compat_reshape=compat_reshape)
        return out.reshape(b, h, w, c)

    q = conv2d(params["q"], xn, stride=1, padding=0, dtype=dtype)  # [B,H,W,C]
    q = q.reshape(b, h * w, num_heads, hd).transpose(0, 2, 1, 3)  # [B,Hd,L,D]

    if compat_reshape:
        # Bit-exact reproduction of the reference's [B,S,C]->[B,nh,hd,S]
        # raw reshape (vae_decoder.py:55-56): flatten then re-split row-major.
        k = k.reshape(b, num_heads, hd, s).transpose(0, 1, 3, 2)  # [B,nh,S,hd]
        v = v.reshape(b, num_heads, hd, s).transpose(0, 1, 3, 2)
    else:
        k = k.reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)

    out = ops.sdpa(q, k, v, bias=text_bias)
    out = out.transpose(0, 2, 1, 3).reshape(b, h, w, c)
    out = conv2d(params["proj"], out, stride=1, padding=0, dtype=dtype)
    return out + residual
