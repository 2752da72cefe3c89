"""Text+time-conditioned epsilon-prediction UNet on 27x27x8 latents.

TPU-native re-design of the reference UNet (src/models/unet.py:304-509):

- init_conv 8->320; encoder levels [320x2 @27, 640x2 @14, 1280x2 @7,
  1280x2 @4] with stride-2 3x3 downsample convs (unet.py:335,342,349);
  middle block @4; decoder mirrors with bilinear upsample to exact sizes
  (7,7)/(14,14)/(27,27) + conv (unet.py:364-387).
- attention on every level except 27x27 (unet.py:330-331,391-392).
- decoder levels re-concatenate the SAME skip tensor before BOTH of their
  blocks (unet.py:481-483,487-490) — so decoder blocks take 2x channels in.
- conditioning enters twice: a pooled text vector is FiLM-added in every
  ResBlock together with the time embedding (unet.py:119-124), and the full
  text sequence feeds self+cross attention blocks (unet.py:232-239).
- the reference damps attention outputs (x0.7 self / x0.8 cross / x0.6 FFN,
  unet.py:220,238,250); those scales are config knobs here (set to 1.0 for
  the structurally-stable path — fp32 softmax makes damping unnecessary).

Init matches unet.py:405-426: convs kaiming-normal(fan_out), linears
xavier-uniform(gain=0.02), zero biases, near-zero final conv.

Layout is NHWC end-to-end; attention cores route through psg_tpu.ops.sdpa
(Pallas flash kernel on TPU).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from psg_tpu.nn.attention import mha, mha_init
from psg_tpu.nn.embeddings import sinusoidal_time_embedding
from psg_tpu.nn.layers import (
    conv2d,
    conv2d_init,
    group_norm,
    group_norm_init,
    largest_group_count,
    linear,
    linear_init,
)
from psg_tpu.nn.resize import bilinear_resize


class UNetSpec(NamedTuple):
    """Static architecture spec (hashable -> safe as a jit static arg)."""

    latent_dim: int = 8
    text_dim: int = 768
    time_emb_dim: int = 128
    num_heads: int = 4
    channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    blocks_per_level: int = 2
    attention_levels: Tuple[bool, ...] = (False, True, True, True)
    spatial: Tuple[int, ...] = (27, 14, 7, 4)
    self_attn_scale: float = 0.7
    cross_attn_scale: float = 0.8
    ffn_scale: float = 0.6
    attn_dropout: float = 0.05


# ---------------------------------------------------------------------------
# ResBlock with time/text FiLM-adds (reference: unet.py:58-132)
# ---------------------------------------------------------------------------


def resblock_init(key, cin: int, cout: int, time_dim: int, text_dim: int,
                  dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    p = {
        "norm1": group_norm_init(cin, dtype),
        "conv1": conv2d_init(ks[0], cin, cout, 3, init="kaiming_normal", dtype=dtype),
        "time_proj": linear_init(ks[1], time_dim, cout, init="xavier", gain=0.02, dtype=dtype),
        "text_proj": linear_init(ks[2], text_dim, cout, init="xavier", gain=0.02, dtype=dtype),
        "norm2": group_norm_init(cout, dtype),
        "conv2": conv2d_init(ks[3], cout, cout, 3, init="kaiming_normal", dtype=dtype),
    }
    if cin != cout:
        p["skip"] = conv2d_init(ks[4], cin, cout, 1, init="kaiming_normal", dtype=dtype)
    return p


def resblock_apply(params, x, time_emb, text_pooled, *, cin: int, cout: int,
                   dtype=None):
    from psg_tpu import ops

    gi = largest_group_count(cin)
    go = largest_group_count(cout)
    residual = x
    h = ops.group_norm_silu(params["norm1"], x, gi, eps=1e-5)
    h = conv2d(params["conv1"], h, stride=1, padding=1, dtype=dtype)
    h = h + linear(params["time_proj"], time_emb, dtype=dtype)[:, None, None, :]
    h = h + linear(params["text_proj"], text_pooled, dtype=dtype)[:, None, None, :]
    h = ops.group_norm_silu(params["norm2"], h, go, eps=1e-5)
    h = conv2d(params["conv2"], h, stride=1, padding=1, dtype=dtype)
    if "skip" in params:
        residual = conv2d(params["skip"], residual, stride=1, padding=0, dtype=dtype)
    return h + residual


# ---------------------------------------------------------------------------
# Self+cross attention transformer block (reference: unet.py:135-260)
# ---------------------------------------------------------------------------


def attnblock_init(key, channels: int, text_dim: int, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    return {
        "norm1": group_norm_init(channels, dtype),
        "norm2": group_norm_init(channels, dtype),
        "self_attn": mha_init(ks[0], channels, dtype=dtype),
        "cross_attn": mha_init(ks[1], channels, dtype=dtype),
        "text_proj": linear_init(ks[2], text_dim, channels, init="xavier", gain=0.02, dtype=dtype),
        "ffn1": linear_init(ks[3], channels, channels * 2, init="xavier", gain=0.02, dtype=dtype),
        "ffn2": linear_init(ks[4], channels * 2, channels, init="xavier", gain=0.02, dtype=dtype),
    }


def attnblock_apply(params, x, text_seq, spec: UNetSpec, *, channels: int,
                    text_bias=None, dtype=None, dropout_key=None):
    """x: [B,H,W,C]; text_seq: [B,S,text_dim]."""
    b, h, w, c = x.shape
    g = largest_group_count(channels)
    seq = x.reshape(b, h * w, c)

    rate = spec.attn_dropout if dropout_key is not None else 0.0
    dk = (
        jax.random.split(dropout_key, 3)
        if dropout_key is not None
        else (None, None, None)
    )

    # self-attention (GroupNorm over channels, eps=1e-6: unet.py:156-157)
    xn = group_norm(params["norm1"], seq, g, eps=1e-6)
    attn = mha(params["self_attn"], xn, xn, spec.num_heads, dtype=dtype,
               dropout_rate=rate, dropout_key=dk[0])
    seq = seq + spec.self_attn_scale * attn

    # cross-attention against projected text
    xn = group_norm(params["norm2"], seq, g, eps=1e-6)
    text_proj = linear(params["text_proj"], text_seq, dtype=dtype)
    attn = mha(params["cross_attn"], xn, text_proj, spec.num_heads,
               bias=text_bias, dtype=dtype, dropout_rate=rate, dropout_key=dk[1])
    seq = seq + spec.cross_attn_scale * attn

    # 2x-expansion GELU FFN (unet.py:181-187)
    ff = linear(params["ffn1"], seq, dtype=dtype)
    ff = jax.nn.gelu(ff, approximate=False)
    ff = linear(params["ffn2"], ff, dtype=dtype)
    if rate > 0.0:
        keep = jax.random.bernoulli(dk[2], 1.0 - rate, ff.shape)
        ff = jnp.where(keep, ff / (1.0 - rate), 0.0).astype(ff.dtype)
    seq = seq + spec.ffn_scale * ff

    return seq.reshape(b, h, w, c)


# ---------------------------------------------------------------------------
# UNet block = ResBlock (+ attention)  (reference: unet.py:263-301)
# ---------------------------------------------------------------------------


def unetblock_init(key, cin: int, cout: int, spec: UNetSpec,
                   has_attention: bool, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    p = {"res": resblock_init(k1, cin, cout, spec.time_emb_dim, spec.text_dim, dtype)}
    if has_attention:
        p["attn"] = attnblock_init(k2, cout, spec.text_dim, dtype)
    return p


def unetblock_apply(params, x, time_emb, text_pooled, text_seq, spec: UNetSpec,
                    *, cin: int, cout: int, text_bias=None, dtype=None,
                    dropout_key=None):
    x = resblock_apply(params["res"], x, time_emb, text_pooled,
                       cin=cin, cout=cout, dtype=dtype)
    if "attn" in params:
        x = attnblock_apply(params["attn"], x, text_seq, spec, channels=cout,
                            text_bias=text_bias, dtype=dtype,
                            dropout_key=dropout_key)
    return x


# ---------------------------------------------------------------------------
# Full UNet
# ---------------------------------------------------------------------------


def unet_init(key, spec: UNetSpec = UNetSpec(), dtype=jnp.float32):
    nlvl = len(spec.channels)
    ks = iter(jax.random.split(key, 64))
    ch = spec.channels
    p = {}

    # time-embedding MLP dim -> 4*dim -> 4*dim -> dim (unet.py:28-34)
    d = spec.time_emb_dim
    p["time_mlp"] = {
        "l1": linear_init(next(ks), d, d * 4, init="xavier", gain=0.02, dtype=dtype),
        "l2": linear_init(next(ks), d * 4, d * 4, init="xavier", gain=0.02, dtype=dtype),
        "l3": linear_init(next(ks), d * 4, d, init="xavier", gain=0.02, dtype=dtype),
    }

    p["init_conv"] = conv2d_init(next(ks), spec.latent_dim, ch[0], 3,
                                 init="kaiming_normal", dtype=dtype)

    for lvl in range(nlvl):
        has_attn = spec.attention_levels[lvl]
        if lvl > 0:
            p[f"down{lvl}"] = conv2d_init(next(ks), ch[lvl - 1], ch[lvl], 3,
                                          init="kaiming_normal", dtype=dtype)
        p[f"enc{lvl}"] = [
            unetblock_init(next(ks), ch[lvl], ch[lvl], spec, has_attn, dtype)
            for _ in range(spec.blocks_per_level)
        ]

    p["middle"] = unetblock_init(next(ks), ch[-1], ch[-1], spec, True, dtype)

    for lvl in reversed(range(nlvl)):
        has_attn = spec.attention_levels[lvl]
        p[f"dec{lvl}"] = [
            unetblock_init(next(ks), 2 * ch[lvl], ch[lvl], spec, has_attn, dtype)
            for _ in range(spec.blocks_per_level)
        ]
        if lvl > 0:
            p[f"up{lvl}"] = conv2d_init(next(ks), ch[lvl], ch[lvl - 1], 3,
                                        init="kaiming_normal", dtype=dtype)

    p["final_norm"] = group_norm_init(ch[0], dtype)
    # near-zero final conv (unet.py:421-426)
    p["final_conv"] = conv2d_init(next(ks), ch[0], spec.latent_dim, 3,
                                  init="xavier", gain=0.02, dtype=dtype)
    return p


def pooled_text(text_seq, text_mask=None):
    """Pooled text vector for FiLM conditioning.

    The reference pools with AdaptiveAvgPool1d over the (dynamically padded)
    sequence (unet.py:322,445).  With static padding we mask the mean so pad
    tokens don't dilute it; pass ``text_mask=None`` for the reference's
    plain mean.
    """
    if text_mask is None:
        return jnp.mean(text_seq, axis=1)
    m = text_mask.astype(text_seq.dtype)[:, :, None]
    denom = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    return jnp.sum(text_seq * m, axis=1) / denom


def text_bias_from_mask(text_mask, dtype=jnp.float32):
    """[B,S] 0/1 mask -> additive [B,1,1,S] attention bias."""
    if text_mask is None:
        return None
    return jnp.where(text_mask[:, None, None, :] > 0, 0.0, -1e9).astype(dtype)


def unet_apply(params, noisy_latent, timesteps, text_seq, spec: UNetSpec, *,
               text_mask=None, dtype=None, dropout_key=None):
    """Predict noise.

    noisy_latent: [B, 27, 27, latent_dim]; timesteps: [B];
    text_seq: [B, S, text_dim] -> [B, 27, 27, latent_dim].
    """
    nlvl = len(spec.channels)
    ch = spec.channels

    # time embedding (unet.py:442)
    t = sinusoidal_time_embedding(timesteps, spec.time_emb_dim)
    tm = params["time_mlp"]
    t = jax.nn.silu(linear(tm["l1"], t, dtype=dtype))
    t = jax.nn.silu(linear(tm["l2"], t, dtype=dtype))
    time_emb = linear(tm["l3"], t, dtype=dtype)

    tp = pooled_text(text_seq, text_mask)
    tb = text_bias_from_mask(text_mask)

    nblocks_total = (2 * nlvl + 1) * spec.blocks_per_level + 1
    dks = (
        list(jax.random.split(dropout_key, nblocks_total))
        if dropout_key is not None
        else [None] * nblocks_total
    )
    dki = iter(dks)

    x = conv2d(params["init_conv"], noisy_latent, stride=1, padding=1, dtype=dtype)

    skips = []
    for lvl in range(nlvl):
        if lvl > 0:
            x = conv2d(params[f"down{lvl}"], x, stride=2, padding=1, dtype=dtype)
        for blk in params[f"enc{lvl}"]:
            x = unetblock_apply(blk, x, time_emb, tp, text_seq, spec,
                                cin=ch[lvl], cout=ch[lvl], text_bias=tb,
                                dtype=dtype, dropout_key=next(dki))
        skips.append(x)

    x = unetblock_apply(params["middle"], x, time_emb, tp, text_seq, spec,
                        cin=ch[-1], cout=ch[-1], text_bias=tb, dtype=dtype,
                        dropout_key=next(dki))

    for lvl in reversed(range(nlvl)):
        skip = skips.pop()
        # The same skip tensor is concatenated before BOTH decoder blocks
        # of the level (unet.py:481-483,487-490).
        for blk in params[f"dec{lvl}"]:
            x = jnp.concatenate([x, skip], axis=-1)
            x = unetblock_apply(blk, x, time_emb, tp, text_seq, spec,
                                cin=2 * ch[lvl], cout=ch[lvl], text_bias=tb,
                                dtype=dtype, dropout_key=next(dki))
        if lvl > 0:
            target = spec.spatial[lvl - 1]
            x = bilinear_resize(x, (target, target))
            x = conv2d(params[f"up{lvl}"], x, stride=1, padding=1, dtype=dtype)

    from psg_tpu import ops

    # GroupNorm(32, 320) in the reference (unet.py:397); the divisor rule
    # generalizes it to narrow test configs
    x = ops.group_norm_silu(params["final_norm"], x,
                            largest_group_count(ch[0]), eps=1e-5)
    return conv2d(params["final_conv"], x, stride=1, padding=1, dtype=dtype)


def _smoke_test():  # pragma: no cover
    """`python -m psg_tpu.models.unet` — the analog of the reference's
    in-module test_unet (unet.py:512-542), at a reduced width."""
    import jax

    spec = UNetSpec(text_dim=256, channels=(32, 64, 96, 96), num_heads=4)
    params = unet_init(jax.random.PRNGKey(0), spec)
    n = sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 27, 27, 8))
    t = jnp.array([0, 999])
    txt = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 256))
    out = jax.jit(lambda p, x, t, s: unet_apply(p, x, t, s, spec))(
        params, x, t, txt)
    print(f"params (reduced width): {n:,}")
    print("output:", out.shape)
    assert out.shape == x.shape
    print("UNet smoke test passed")


if __name__ == "__main__":  # pragma: no cover
    _smoke_test()
