"""Stable-Diffusion-1.5-family UNet (UNet2DConditionModel) in functional JAX.

Covers the reference's alternative stage-2 backbone, ``DiffusersUNet``
(src/models/diffusers_unet.py): a pretrained SD-1.5 UNet adapted to the
8-channel 27x27 Pokemon latent space.  Implemented natively here:

- architecture: conv_in -> 3x CrossAttnDownBlock + DownBlock -> mid
  (ResNet/Transformer/ResNet) -> UpBlock + 3x CrossAttnUpBlock ->
  GN+SiLU+conv_out; ResnetBlock2D with time-FiLM add; Transformer2D blocks
  with self-attn, cross-attn on 768-d text states, and GEGLU FF;
- odd-spatial support: upsamplers target the exact skip size (27->14->7->4
  and back), matching diffusers' forward_upsample_size handling;
- channel adaptation conv_in 4->8 / conv_out 4->8 by weight slicing /
  tiling-with-averaging (diffusers_unet.py:110-248), as a pure function on
  converted params;
- text projection + LayerNorm when text_dim != 768
  (diffusers_unet.py:178-192);
- training modes full / cross_attention_only / decoder_only as trainable
  masks (diffusers_unet.py:313-360) — the jit-friendly requires_grad;
- ``psg_tpu.models.convert.convert_sd_unet`` maps a diffusers state_dict
  onto this structure (pretrained weights; offline falls back to random
  init exactly like diffusers_trainer.py:258-269).

No NaN scrubbing (diffusers_unet.py:364-459): fp32 norms/softmax make the
scrubbing structurally unnecessary.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from psg_tpu import ops
from psg_tpu.nn.layers import (
    conv2d,
    conv2d_init,
    group_norm,
    group_norm_init,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
)


class SDUNetSpec(NamedTuple):
    in_channels: int = 4
    out_channels: int = 4
    channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    num_heads: int = 8
    cross_attention_dim: int = 768
    norm_groups: int = 32

    @classmethod
    def sd15(cls) -> "SDUNetSpec":
        return cls()

    @classmethod
    def tiny_test(cls, text_dim: int = 32) -> "SDUNetSpec":
        return cls(channels=(16, 24, 32, 32), num_heads=2,
                   cross_attention_dim=text_dim, norm_groups=8)


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


def _resnet_init(key, cin, cout, temb_dim, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    p = {
        "norm1": group_norm_init(cin, dtype),
        "conv1": conv2d_init(ks[0], cin, cout, 3, init="torch", dtype=dtype),
        "time_emb_proj": linear_init(ks[1], temb_dim, cout, init="torch", dtype=dtype),
        "norm2": group_norm_init(cout, dtype),
        "conv2": conv2d_init(ks[2], cout, cout, 3, init="torch", dtype=dtype),
    }
    if cin != cout:
        p["conv_shortcut"] = conv2d_init(ks[3], cin, cout, 1, init="torch", dtype=dtype)
    return p


def _resnet_apply(p, x, temb, groups, dtype=None):
    from psg_tpu import ops

    residual = x
    h = ops.group_norm_silu(p["norm1"], x, groups, eps=1e-5)
    h = conv2d(p["conv1"], h, stride=1, padding=1, dtype=dtype)
    t = linear(p["time_emb_proj"], jax.nn.silu(temb), dtype=dtype)
    h = h + t[:, None, None, :]
    h = ops.group_norm_silu(p["norm2"], h, groups, eps=1e-5)
    h = conv2d(p["conv2"], h, stride=1, padding=1, dtype=dtype)
    if "conv_shortcut" in p:
        residual = conv2d(p["conv_shortcut"], residual, stride=1, padding=0, dtype=dtype)
    return h + residual


def _attention_init(key, dim, kv_dim, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    return {
        "to_q": {"w": linear_init(ks[0], dim, dim, init="xavier", dtype=dtype)["w"]},
        "to_k": {"w": linear_init(ks[1], kv_dim, dim, init="xavier", dtype=dtype)["w"]},
        "to_v": {"w": linear_init(ks[2], kv_dim, dim, init="xavier", dtype=dtype)["w"]},
        "to_out": linear_init(ks[3], dim, dim, init="torch", dtype=dtype),
    }


def _attention_apply(p, x, kv, heads, bias=None, dtype=None):
    b, l, c = x.shape
    s = kv.shape[1]
    hd = c // heads
    if dtype is not None:
        x, kv = x.astype(dtype), kv.astype(dtype)
    q = jnp.dot(x, p["to_q"]["w"].astype(x.dtype), preferred_element_type=jnp.float32)
    k = jnp.dot(kv, p["to_k"]["w"].astype(x.dtype), preferred_element_type=jnp.float32)
    v = jnp.dot(kv, p["to_v"]["w"].astype(x.dtype), preferred_element_type=jnp.float32)
    q = q.astype(x.dtype).reshape(b, l, heads, hd).transpose(0, 2, 1, 3)
    k = k.astype(x.dtype).reshape(b, s, heads, hd).transpose(0, 2, 1, 3)
    v = v.astype(x.dtype).reshape(b, s, heads, hd).transpose(0, 2, 1, 3)
    out = ops.sdpa(q, k, v, bias=bias)
    out = out.transpose(0, 2, 1, 3).reshape(b, l, c)
    return linear(p["to_out"], out, dtype=dtype)


def _transformer_init(key, dim, kv_dim, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    return {
        "norm": group_norm_init(dim, dtype),
        "proj_in": conv2d_init(ks[0], dim, dim, 1, init="torch", dtype=dtype),
        "norm1": layer_norm_init(dim, dtype),
        "attn1": _attention_init(ks[1], dim, dim, dtype),
        "norm2": layer_norm_init(dim, dtype),
        "attn2": _attention_init(ks[2], dim, kv_dim, dtype),
        "norm3": layer_norm_init(dim, dtype),
        "ff_proj": linear_init(ks[3], dim, dim * 8, init="torch", dtype=dtype),  # GEGLU
        "ff_out": linear_init(ks[4], dim * 4, dim, init="torch", dtype=dtype),
        "proj_out": conv2d_init(ks[5], dim, dim, 1, init="torch", dtype=dtype),
    }


def _transformer_apply(p, x, text, spec: SDUNetSpec, text_bias=None, dtype=None):
    b, h, w, c = x.shape
    residual = x
    xn = group_norm(p["norm"], x, spec.norm_groups, eps=1e-6)
    xn = conv2d(p["proj_in"], xn, stride=1, padding=0, dtype=dtype)
    seq = xn.reshape(b, h * w, c)

    n1 = layer_norm(p["norm1"], seq)
    seq = seq + _attention_apply(p["attn1"], n1, n1, spec.num_heads, dtype=dtype)
    seq = seq + _attention_apply(p["attn2"], layer_norm(p["norm2"], seq), text,
                                 spec.num_heads, bias=text_bias, dtype=dtype)
    # GEGLU (diffusers order: first half = value, second half = gate)
    ff = linear(p["ff_proj"], layer_norm(p["norm3"], seq), dtype=dtype)
    val, gate = jnp.split(ff, 2, axis=-1)
    seq = seq + linear(p["ff_out"], val * jax.nn.gelu(gate, approximate=False),
                       dtype=dtype)

    out = seq.reshape(b, h, w, c)
    out = conv2d(p["proj_out"], out, stride=1, padding=0, dtype=dtype)
    return out + residual


# ---------------------------------------------------------------------------
# full UNet
# ---------------------------------------------------------------------------


def sd_unet_init(key, spec: SDUNetSpec = SDUNetSpec.sd15(), dtype=jnp.float32):
    ch = spec.channels
    nlvl = len(ch)
    temb = ch[0] * 4
    ks = iter(jax.random.split(key, 256))
    p = {
        "conv_in": conv2d_init(next(ks), spec.in_channels, ch[0], 3, init="torch", dtype=dtype),
        "time_embedding": {
            "linear_1": linear_init(next(ks), ch[0], temb, init="torch", dtype=dtype),
            "linear_2": linear_init(next(ks), temb, temb, init="torch", dtype=dtype),
        },
        "down_blocks": [],
        "up_blocks": [],
    }
    # down: CrossAttn x3 + plain DownBlock; downsampler on all but last
    cin = ch[0]
    for lvl in range(nlvl):
        has_attn = lvl < nlvl - 1
        blk = {"resnets": [], "attentions": [] if has_attn else None}
        for j in range(spec.layers_per_block):
            blk["resnets"].append(_resnet_init(next(ks), cin if j == 0 else ch[lvl],
                                               ch[lvl], temb, dtype))
            if has_attn:
                blk["attentions"].append(
                    _transformer_init(next(ks), ch[lvl], spec.cross_attention_dim, dtype))
        if lvl < nlvl - 1:
            blk["downsampler"] = conv2d_init(next(ks), ch[lvl], ch[lvl], 3,
                                             init="torch", dtype=dtype)
        p["down_blocks"].append(blk)
        cin = ch[lvl]

    p["mid_block"] = {
        "resnets": [_resnet_init(next(ks), ch[-1], ch[-1], temb, dtype),
                    _resnet_init(next(ks), ch[-1], ch[-1], temb, dtype)],
        "attentions": [_transformer_init(next(ks), ch[-1],
                                         spec.cross_attention_dim, dtype)],
    }

    # up: plain UpBlock + CrossAttn x3 (reversed channels)
    rev = list(reversed(ch))  # e.g. (1280, 1280, 640, 320)
    prev = ch[-1]
    for lvl in range(nlvl):
        cout = rev[lvl]
        has_attn = lvl > 0
        blk = {"resnets": [], "attentions": [] if has_attn else None}
        for j in range(spec.layers_per_block + 1):
            # skip channels: the matching down-level activations
            skip_ch = rev[min(lvl + 1, nlvl - 1)] if j == spec.layers_per_block else cout
            res_in = (prev if j == 0 else cout) + skip_ch
            blk["resnets"].append(_resnet_init(next(ks), res_in, cout, temb, dtype))
            if has_attn:
                blk["attentions"].append(
                    _transformer_init(next(ks), cout, spec.cross_attention_dim, dtype))
        if lvl < nlvl - 1:
            blk["upsampler"] = conv2d_init(next(ks), cout, cout, 3,
                                           init="torch", dtype=dtype)
        p["up_blocks"].append(blk)
        prev = cout

    p["conv_norm_out"] = group_norm_init(ch[0], dtype)
    p["conv_out"] = conv2d_init(next(ks), ch[0], spec.out_channels, 3,
                                init="torch", dtype=dtype)
    return p


def sd_timestep_embedding(timesteps, dim: int):
    """diffusers Timesteps(dim, flip_sin_to_cos=True, freq_shift=0):
    exponent denominator is ``half`` (not half-1) and cos comes first."""
    half = dim // 2
    coeff = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / half))
    args = timesteps.astype(jnp.float32)[:, None] * coeff[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def sd_unet_apply(params, sample, timesteps, text_states,
                  spec: SDUNetSpec = SDUNetSpec.sd15(), *, text_bias=None,
                  dtype=None):
    """sample: [B,H,W,in_ch]; timesteps: [B]; text_states: [B,S,768]."""
    ch = spec.channels
    nlvl = len(ch)
    g = spec.norm_groups

    t = sd_timestep_embedding(timesteps, ch[0])
    te = params["time_embedding"]
    temb = linear(te["linear_2"], jax.nn.silu(linear(te["linear_1"], t, dtype=dtype)),
                  dtype=dtype)

    x = conv2d(params["conv_in"], sample, stride=1, padding=1, dtype=dtype)
    skips = [x]
    for lvl, blk in enumerate(params["down_blocks"]):
        for j, rp in enumerate(blk["resnets"]):
            x = _resnet_apply(rp, x, temb, g, dtype=dtype)
            if blk["attentions"] is not None:
                x = _transformer_apply(blk["attentions"][j], x, text_states,
                                       spec, text_bias=text_bias, dtype=dtype)
            skips.append(x)
        if "downsampler" in blk:
            x = conv2d(blk["downsampler"], x, stride=2, padding=1, dtype=dtype)
            skips.append(x)

    mp = params["mid_block"]
    x = _resnet_apply(mp["resnets"][0], x, temb, g, dtype=dtype)
    x = _transformer_apply(mp["attentions"][0], x, text_states, spec,
                           text_bias=text_bias, dtype=dtype)
    x = _resnet_apply(mp["resnets"][1], x, temb, g, dtype=dtype)

    for lvl, blk in enumerate(params["up_blocks"]):
        for j, rp in enumerate(blk["resnets"]):
            skip = skips.pop()
            x = jnp.concatenate([x, skip], axis=-1)
            x = _resnet_apply(rp, x, temb, g, dtype=dtype)
            if blk["attentions"] is not None:
                x = _transformer_apply(blk["attentions"][j], x, text_states,
                                       spec, text_bias=text_bias, dtype=dtype)
        if "upsampler" in blk:
            # NEAREST upsample (diffusers Upsample2D) to the NEXT skip's
            # spatial size (forward_upsample_size path — required for
            # the odd 27/14/7/4 ladder)
            target = skips[-1].shape[1]
            b_, h_, w_, c_ = x.shape
            x = jax.image.resize(x, (b_, target, target, c_), method="nearest")
            x = conv2d(blk["upsampler"], x, stride=1, padding=1, dtype=dtype)

    from psg_tpu import ops

    x = ops.group_norm_silu(params["conv_norm_out"], x, g, eps=1e-5)
    return conv2d(params["conv_out"], x, stride=1, padding=1, dtype=dtype)


# ---------------------------------------------------------------------------
# channel adaptation (diffusers_unet.py:110-248) on HWIO kernels
# ---------------------------------------------------------------------------


def adapt_in_channels(params, target: int):
    """Slice or tile-and-average conv_in's input-channel axis (HWIO axis 2)."""
    w = params["conv_in"]["w"]
    orig = w.shape[2]
    if target == orig:
        return params
    if target < orig:
        new_w = w[:, :, :target, :]
    else:
        reps, rem = divmod(target, orig)
        parts = [w] * reps + ([w[:, :, :rem, :]] if rem else [])
        new_w = jnp.concatenate(parts, axis=2) / reps
    out = dict(params)
    out["conv_in"] = {"w": new_w, "b": params["conv_in"]["b"]}
    return out


def adapt_out_channels(params, target: int):
    """Slice or tile-and-average conv_out's output axis (HWIO axis 3 + bias)."""
    w = params["conv_out"]["w"]
    b = params["conv_out"]["b"]
    orig = w.shape[3]
    if target == orig:
        return params
    if target < orig:
        new_w, new_b = w[:, :, :, :target], b[:target]
    else:
        reps, rem = divmod(target, orig)
        wparts = [w] * reps + ([w[:, :, :, :rem]] if rem else [])
        bparts = [b] * reps + ([b[:rem]] if rem else [])
        new_w = jnp.concatenate(wparts, axis=3) / reps
        new_b = jnp.concatenate(bparts) / reps
    out = dict(params)
    out["conv_out"] = {"w": new_w, "b": new_b}
    return out


# ---------------------------------------------------------------------------
# DiffusersUNet-equivalent wrapper: text projection + training modes
# ---------------------------------------------------------------------------


def sd_wrapper_init(key, spec: SDUNetSpec, text_dim: int, *,
                    latent_dim: int = 8, base_params=None, dtype=jnp.float32):
    """Full wrapper params: (possibly pretrained) SD UNet adapted to
    ``latent_dim`` channels + optional text projection/LN."""
    k1, k2 = jax.random.split(key)
    unet = base_params if base_params is not None else sd_unet_init(k1, spec, dtype)
    unet = adapt_in_channels(unet, latent_dim)
    unet = adapt_out_channels(unet, latent_dim)
    p = {"unet": unet}
    if text_dim != spec.cross_attention_dim:
        p["text_projection"] = linear_init(k2, text_dim, spec.cross_attention_dim,
                                           init="xavier", gain=0.02, dtype=dtype)
        p["text_layer_norm"] = layer_norm_init(spec.cross_attention_dim, dtype)
    return p


def sd_wrapper_apply(params, sample, timesteps, text_emb, spec: SDUNetSpec, *,
                     text_bias=None, dtype=None):
    if "text_projection" in params:
        text_emb = linear(params["text_projection"], text_emb, dtype=dtype)
        text_emb = layer_norm(params["text_layer_norm"], text_emb, eps=1e-6)
    return sd_unet_apply(params["unet"], sample, timesteps, text_emb, spec,
                         text_bias=text_bias, dtype=dtype)


def sd_training_mask(params, mode: str = "full"):
    """Trainable-mask pytree for the three reference modes
    (diffusers_unet.py:313-360)."""
    if mode not in ("full", "cross_attention_only", "decoder_only"):
        raise ValueError(f"unknown training mode {mode!r}")

    def fill(tree, value):
        return jax.tree_util.tree_map(lambda _: value, tree)

    unet = params["unet"]
    if mode == "full":
        mask_unet = fill(unet, True)
    else:
        def unfreeze_cross_attn(block_mask, block_params):
            if block_params.get("attentions"):
                for j, ap in enumerate(block_params["attentions"]):
                    block_mask["attentions"][j]["attn2"] = fill(ap["attn2"], True)
                    block_mask["attentions"][j]["norm2"] = fill(ap["norm2"], True)

        mask_unet = fill(unet, False)
        if mode == "cross_attention_only":
            for bm, bp in zip(mask_unet["down_blocks"], unet["down_blocks"]):
                unfreeze_cross_attn(bm, bp)
            for bm, bp in zip(mask_unet["up_blocks"], unet["up_blocks"]):
                unfreeze_cross_attn(bm, bp)
            unfreeze_cross_attn(mask_unet["mid_block"], unet["mid_block"])
            mask_unet["conv_in"] = fill(unet["conv_in"], True)
            mask_unet["conv_out"] = fill(unet["conv_out"], True)
        else:  # decoder_only: mid + up + conv_out (+ cross-attn everywhere)
            mask_unet["mid_block"] = fill(unet["mid_block"], True)
            mask_unet["up_blocks"] = fill(unet["up_blocks"], True)
            mask_unet["conv_out"] = fill(unet["conv_out"], True)
            for bm, bp in zip(mask_unet["down_blocks"], unet["down_blocks"]):
                unfreeze_cross_attn(bm, bp)

    out = {"unet": mask_unet}
    # projection + LN always trainable (diffusers_unet.py:358-360)
    if "text_projection" in params:
        out["text_projection"] = fill(params["text_projection"], True)
        out["text_layer_norm"] = fill(params["text_layer_norm"], True)
    return out
