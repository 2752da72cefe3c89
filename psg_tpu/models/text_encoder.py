"""Text encoder: BERT -> projection -> LayerNorm, with selective
fine-tuning as a trainable-mask over the param pytree.

Mirrors the reference TextEncoder (src/models/text_encoder.py:6-163), with
two TPU-first changes:

- tokenization moved OUT of forward into the data layer (the reference
  tokenizes per call, text_encoder.py:148 — a host sync per step);
- the finetune strategies none/minimal/partial/full
  (text_encoder.py:62-113) become a boolean pytree mask consumed by
  ``optax.masked`` style wrappers — frozen params simply get zero updates,
  which is the jit-friendly equivalent of ``requires_grad=False``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from psg_tpu.models.bert import BertConfig, bert_apply, bert_init
from psg_tpu.nn.layers import layer_norm, layer_norm_init, linear, linear_init


def text_encoder_init(key, cfg: BertConfig, text_dim: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    params = {"bert": bert_init(k1, cfg, dtype)}
    if cfg.hidden_size != text_dim:
        params["projection"] = linear_init(k2, cfg.hidden_size, text_dim,
                                           init="torch", dtype=dtype)
    params["ln"] = layer_norm_init(text_dim, dtype)
    return params


def text_encoder_apply(params, input_ids, attention_mask, cfg: BertConfig, *,
                       dtype=None):
    """ids/mask: [B, S] -> normalized hidden states [B, S, text_dim]."""
    hidden, _pooled = bert_apply(params["bert"], input_ids, attention_mask,
                                 cfg, dtype=dtype)
    if "projection" in params:
        hidden = linear(params["projection"], hidden, dtype=dtype)
    return layer_norm(params["ln"], hidden, eps=1e-5)


def finetune_mask(params, cfg: BertConfig, strategy: str = "minimal"):
    """Boolean pytree: True = trainable.

    - 'none':    only projection + final LayerNorm
    - 'minimal': + last 2 BERT layers + pooler   (reference default)
    - 'partial': + last 4 BERT layers + pooler
    - 'full':    everything
    """
    if strategy not in ("none", "minimal", "partial", "full"):
        raise ValueError(f"unknown finetune_strategy {strategy!r}")

    n_unfrozen = {"none": 0, "minimal": 2, "partial": 4,
                  "full": cfg.num_layers}[strategy]
    first_trainable = cfg.num_layers - n_unfrozen

    def mask_like(tree, value):
        return jax.tree_util.tree_map(lambda _: value, tree)

    bert = params["bert"]
    bert_mask = {
        "embeddings": mask_like(bert["embeddings"], strategy == "full"),
        "layers": [
            mask_like(layer, i >= first_trainable)
            for i, layer in enumerate(bert["layers"])
        ],
        # pooler trains in every non-'none' strategy (text_encoder.py:83-85)
        "pooler": mask_like(bert["pooler"], strategy != "none"),
    }
    out = {"bert": bert_mask, "ln": mask_like(params["ln"], True)}
    if "projection" in params:
        out["projection"] = mask_like(params["projection"], True)
    return out
