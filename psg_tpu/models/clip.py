"""CLIP (ViT-B/32) in functional JAX, for the stage-3 alignment loss.

Covers the reference CLIPLoss (src/models/clip_loss.py:12-69): frozen
``openai/clip-vit-base-patch32``, loss = negative mean cosine similarity of
image/text embeddings.  The architecture is implemented here (vision ViT +
text transformer with quick-GELU and causal text masking); pretrained
weights arrive via psg_tpu.models.convert when a checkpoint file is
available, otherwise a fixed-seed random init keeps the loss plumbing live
offline (a frozen random encoder still yields a well-defined alignment
objective; document the substitution in experiment notes).

Text tokenization: CLIP's BPE merges are unavailable offline, so text ids
come from the framework's WordPiece tokenizer (ids are model-internal —
any fixed vocabulary works for a trained-from-scratch tower; converted
OpenAI weights require the matching BPE vocab file).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from psg_tpu import ops
from psg_tpu.nn.layers import layer_norm, layer_norm_init, linear, linear_init
from psg_tpu.nn.resize import bilinear_resize

CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


class ClipConfig(NamedTuple):
    image_size: int = 224
    patch_size: int = 32
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    text_vocab: int = 49408
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    text_len: int = 77
    embed_dim: int = 512

    @classmethod
    def b32(cls) -> "ClipConfig":
        return cls()

    @classmethod
    def tiny_test(cls, vocab: int = 128) -> "ClipConfig":
        return cls(image_size=64, patch_size=16, vision_width=32,
                   vision_layers=2, vision_heads=2, text_vocab=vocab,
                   text_width=32, text_layers=2, text_heads=2, text_len=16,
                   embed_dim=32)


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _block_init(key, width: int, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    return {
        "ln1": layer_norm_init(width, dtype),
        "q": linear_init(ks[0], width, width, init="torch", dtype=dtype),
        "k": linear_init(ks[1], width, width, init="torch", dtype=dtype),
        "v": linear_init(ks[2], width, width, init="torch", dtype=dtype),
        "out": linear_init(ks[3], width, width, init="torch", dtype=dtype),
        "ln2": layer_norm_init(width, dtype),
        "mlp1": linear_init(ks[4], width, width * 4, init="torch", dtype=dtype),
        "mlp2": linear_init(ks[5], width * 4, width, init="torch", dtype=dtype),
    }


def _block_apply(p, x, heads: int, bias=None, dtype=None):
    b, s, w = x.shape
    hd = w // heads
    xn = layer_norm(p["ln1"], x)
    q = linear(p["q"], xn, dtype=dtype).reshape(b, s, heads, hd).transpose(0, 2, 1, 3)
    k = linear(p["k"], xn, dtype=dtype).reshape(b, s, heads, hd).transpose(0, 2, 1, 3)
    v = linear(p["v"], xn, dtype=dtype).reshape(b, s, heads, hd).transpose(0, 2, 1, 3)
    a = ops.sdpa(q, k, v, bias=bias).transpose(0, 2, 1, 3).reshape(b, s, w)
    x = x + linear(p["out"], a, dtype=dtype)
    xn = layer_norm(p["ln2"], x)
    x = x + linear(p["mlp2"], _quick_gelu(linear(p["mlp1"], xn, dtype=dtype)),
                   dtype=dtype)
    return x


def clip_init(key, cfg: ClipConfig = ClipConfig.b32(), dtype=jnp.float32):
    n_patches = (cfg.image_size // cfg.patch_size) ** 2
    ks = iter(jax.random.split(key, 12 + cfg.vision_layers + cfg.text_layers))
    scale_v = cfg.vision_width ** -0.5
    scale_t = cfg.text_width ** -0.5
    return {
        "vision": {
            "patch": {  # conv expressed as a patch-flatten matmul
                "w": scale_v * jax.random.normal(
                    next(ks),
                    (cfg.patch_size * cfg.patch_size * 3, cfg.vision_width), dtype),
            },
            "cls": scale_v * jax.random.normal(next(ks), (cfg.vision_width,), dtype),
            "pos": scale_v * jax.random.normal(
                next(ks), (n_patches + 1, cfg.vision_width), dtype),
            "ln_pre": layer_norm_init(cfg.vision_width, dtype),
            "blocks": [_block_init(next(ks), cfg.vision_width, dtype)
                       for _ in range(cfg.vision_layers)],
            "ln_post": layer_norm_init(cfg.vision_width, dtype),
            "proj": scale_v * jax.random.normal(
                next(ks), (cfg.vision_width, cfg.embed_dim), dtype),
        },
        "text": {
            "token": 0.02 * jax.random.normal(
                next(ks), (cfg.text_vocab, cfg.text_width), dtype),
            "pos": 0.01 * jax.random.normal(
                next(ks), (cfg.text_len, cfg.text_width), dtype),
            "blocks": [_block_init(next(ks), cfg.text_width, dtype)
                       for _ in range(cfg.text_layers)],
            "ln_final": layer_norm_init(cfg.text_width, dtype),
            "proj": scale_t * jax.random.normal(
                next(ks), (cfg.text_width, cfg.embed_dim), dtype),
        },
    }


def clip_encode_image(params, images01, cfg: ClipConfig, *, dtype=None):
    """images01: [B,H,W,3] in [0,1] -> [B, embed_dim] (unnormalized)."""
    v = params["vision"]
    x = bilinear_resize(images01, (cfg.image_size, cfg.image_size))
    mean = jnp.asarray(CLIP_IMAGE_MEAN, x.dtype)
    std = jnp.asarray(CLIP_IMAGE_STD, x.dtype)
    x = (x - mean) / std
    b = x.shape[0]
    p = cfg.patch_size
    n = cfg.image_size // p
    # [B, n, p, n, p, 3] -> [B, n*n, p*p*3]
    x = x.reshape(b, n, p, n, p, 3).transpose(0, 1, 3, 2, 4, 5).reshape(
        b, n * n, p * p * 3)
    x = jnp.dot(x, v["patch"]["w"].astype(x.dtype),
                preferred_element_type=jnp.float32).astype(x.dtype)
    cls = jnp.broadcast_to(v["cls"].astype(x.dtype), (b, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1) + v["pos"].astype(x.dtype)
    x = layer_norm(v["ln_pre"], x)
    for blk in v["blocks"]:
        x = _block_apply(blk, x, cfg.vision_heads, dtype=dtype)
    x = layer_norm(v["ln_post"], x[:, 0])
    return x @ v["proj"].astype(x.dtype)


def clip_encode_text(params, ids, mask, cfg: ClipConfig, *, dtype=None):
    """ids/mask: [B, S] -> [B, embed_dim]; pools the last valid token (the
    EOT-pooling analog under an arbitrary tokenizer).  Inputs longer than
    ``cfg.text_len`` are truncated (the HF processor truncates to 77,
    clip_loss.py:55)."""
    t = params["text"]
    if ids.shape[1] > cfg.text_len:
        ids = ids[:, : cfg.text_len]
        mask = mask[:, : cfg.text_len]
    b, s = ids.shape
    x = t["token"][ids] + t["pos"][:s]
    # causal + padding bias
    causal = jnp.tril(jnp.ones((s, s), jnp.float32))
    bias = jnp.where(causal[None, None] > 0, 0.0, -1e9)
    bias = bias + jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9)
    for blk in t["blocks"]:
        x = _block_apply(blk, x, cfg.text_heads, bias=bias, dtype=dtype)
    x = layer_norm(t["ln_final"], x)
    last = jnp.maximum(jnp.sum(mask, axis=1) - 1, 0)
    pooled = x[jnp.arange(b), last]
    return pooled @ t["proj"].astype(x.dtype)


def clip_alignment_loss(params, images, text_ids, text_mask,
                        cfg: ClipConfig, *, dtype=None, sample_weights=None):
    """Negative mean cosine similarity (clip_loss.py:55-66).

    images in [-1, 1] (rescaled to [0, 1] internally, clip_loss.py:52).
    ``sample_weights`` [B] excludes padded tail samples during eval.
    """
    img01 = (images + 1.0) / 2.0
    ie = clip_encode_image(params, img01, cfg, dtype=dtype)
    te = clip_encode_text(params, text_ids, text_mask, cfg, dtype=dtype)
    ie = ie / (jnp.linalg.norm(ie, axis=-1, keepdims=True) + 1e-8)
    te = te / (jnp.linalg.norm(te, axis=-1, keepdims=True) + 1e-8)
    cos = jnp.sum(ie * te, axis=-1)
    if sample_weights is None:
        return -jnp.mean(cos)
    w = sample_weights.astype(cos.dtype)
    return -jnp.sum(cos * w) / jnp.maximum(jnp.sum(w), 1.0)
