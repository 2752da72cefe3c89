"""BERT encoder in functional JAX.

Covers the reference's use of HF ``BertModel`` (src/models/text_encoder.py:
33-34,154): embeddings (word+position+type, LayerNorm eps 1e-12), post-LN
transformer layers with exact-GELU FFN, and a tanh pooler.  Weight layout
mirrors HF naming closely so ``psg_tpu.models.convert`` can import
pretrained checkpoints (offline environments fall back to random init, the
same fallback family the reference ships for its own checkpoints,
diffusers_trainer.py:258-269).

Known configs: bert-base-uncased (12L/768H/12A) and prajjwal1/bert-mini
(4L/256H/4A, used by the reference tests, tests/test_model_compatibility.py:35).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from psg_tpu import ops
from psg_tpu.nn.layers import layer_norm, layer_norm_init, linear, linear_init


class BertConfig(NamedTuple):
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position: int = 512
    type_vocab_size: int = 2
    ln_eps: float = 1e-12

    @classmethod
    def base(cls) -> "BertConfig":
        return cls()

    @classmethod
    def mini(cls) -> "BertConfig":
        return cls(hidden_size=256, num_layers=4, num_heads=4,
                   intermediate_size=1024)

    @classmethod
    def tiny_test(cls, vocab_size: int = 128) -> "BertConfig":
        return cls(vocab_size=vocab_size, hidden_size=32, num_layers=2,
                   num_heads=2, intermediate_size=64, max_position=64)


def bert_init(key, cfg: BertConfig, dtype=jnp.float32):
    h = cfg.hidden_size
    ks = iter(jax.random.split(key, 8 + 8 * cfg.num_layers))

    def emb(k, n, d):
        return 0.02 * jax.random.normal(k, (n, d), dtype)

    params = {
        "embeddings": {
            "word": emb(next(ks), cfg.vocab_size, h),
            "position": emb(next(ks), cfg.max_position, h),
            "token_type": emb(next(ks), cfg.type_vocab_size, h),
            "ln": layer_norm_init(h, dtype),
        },
        "layers": [],
        "pooler": linear_init(next(ks), h, h, init="torch", dtype=dtype),
    }
    for _ in range(cfg.num_layers):
        params["layers"].append({
            "attn": {
                "q": linear_init(next(ks), h, h, init="torch", dtype=dtype),
                "k": linear_init(next(ks), h, h, init="torch", dtype=dtype),
                "v": linear_init(next(ks), h, h, init="torch", dtype=dtype),
                "out": linear_init(next(ks), h, h, init="torch", dtype=dtype),
                "ln": layer_norm_init(h, dtype),
            },
            "ffn": {
                "w1": linear_init(next(ks), h, cfg.intermediate_size, init="torch", dtype=dtype),
                "w2": linear_init(next(ks), cfg.intermediate_size, h, init="torch", dtype=dtype),
                "ln": layer_norm_init(h, dtype),
            },
        })
    return params


def _self_attention(p, x, mask_bias, num_heads: int, dtype=None):
    b, s, h = x.shape
    hd = h // num_heads
    q = linear(p["q"], x, dtype=dtype).reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)
    k = linear(p["k"], x, dtype=dtype).reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)
    v = linear(p["v"], x, dtype=dtype).reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)
    out = ops.sdpa(q, k, v, bias=mask_bias)
    out = out.transpose(0, 2, 1, 3).reshape(b, s, h)
    return linear(p["out"], out, dtype=dtype)


def bert_apply(params, input_ids, attention_mask, cfg: BertConfig, *,
               token_type_ids=None, dtype=None):
    """-> (last_hidden_state [B,S,H], pooled [B,H])."""
    b, s = input_ids.shape
    e = params["embeddings"]
    pos_ids = jnp.arange(s)[None, :]
    tt = token_type_ids if token_type_ids is not None else jnp.zeros_like(input_ids)
    x = (
        e["word"][input_ids]
        + e["position"][pos_ids]
        + e["token_type"][tt]
    )
    x = layer_norm(e["ln"], x, eps=cfg.ln_eps)
    if dtype is not None:
        x = x.astype(dtype)

    # additive mask bias [B,1,1,S]
    bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9).astype(jnp.float32)

    for lp in params["layers"]:
        attn = _self_attention(lp["attn"], x, bias, cfg.num_heads, dtype=dtype)
        x = layer_norm(lp["attn"]["ln"], x + attn, eps=cfg.ln_eps)
        ff = linear(lp["ffn"]["w1"], x, dtype=dtype)
        ff = jax.nn.gelu(ff, approximate=False)
        ff = linear(lp["ffn"]["w2"], ff, dtype=dtype)
        x = layer_norm(lp["ffn"]["ln"], x + ff, eps=cfg.ln_eps)

    pooled = jnp.tanh(linear(params["pooler"], x[:, 0], dtype=dtype))
    return x, pooled
