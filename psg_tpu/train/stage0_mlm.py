"""Stage 0 (optional): masked-language-model pretraining of the text tower.

The reference's conditioning quality leans on a PRETRAINED BERT
(src/models/text_encoder.py:30-40, HF download).  This box has zero egress
and no cached weights (README "Capability statement"), so every run so far
has trained the text encoder from scratch on 898 captions inside stage 1 —
the measured root cause of the conditioning ceiling (VERDICT r4 missing #3).
This stage is the zero-egress substitute: BERT-style MLM over the caption
corpus (canonical + augmentation variants, data/caption_augment.py) before
stage 1, so the tower starts with distributional word knowledge instead of
random weights.

Objective: standard BERT masking — 15% of non-special tokens selected;
80% -> [MASK], 10% -> random vocab token, 10% kept — cross-entropy on the
selected positions only.  The head is the BERT-style transform
(dense H->H + GELU + LayerNorm) with the decoder TIED to the word-embedding
table plus a free bias.

TPU-native: the whole corpus lives in HBM ([N, L] int32 is tiny), an epoch
is one ``lax.scan`` over jitted steps (same pattern as train/fastpath.py),
masking is drawn on device per step.

Output: ``{stage_dir}/checkpoints/mlm_best_model.ckpt`` carrying
``{"params": {"text": <text_encoder params>, "mlm": <head>}}``.  Stage 1
warm-starts from it via ``extra.text_init=<path>`` (stage1_vae.py).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from psg_tpu.core.checkpoint import CheckpointManager
from psg_tpu.core.config import Config
from psg_tpu.core.metrics import MetricsWriter, setup_logging
from psg_tpu.models.bert import bert_apply
from psg_tpu.models.text_encoder import text_encoder_init
from psg_tpu.nn.layers import (
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
)
from psg_tpu.train.state import TrainState


def mlm_head_init(key, hidden: int, dtype=jnp.float32):
    """BERT MLM transform head; the vocab decoder is tied to the word
    embedding table, so only the transform + output bias are free."""
    return {
        "transform": linear_init(key, hidden, hidden, init="torch",
                                 dtype=dtype),
        "ln": layer_norm_init(hidden, dtype),
        "bias": None,  # created lazily once vocab_size is known
    }


def mlm_logits(text_params, head, input_ids, attention_mask, cfg, *,
               dtype=None):
    """[B, S] ids -> [B, S, V] vocab logits (tied decoder)."""
    hidden, _ = bert_apply(text_params["bert"], input_ids, attention_mask,
                           cfg, dtype=dtype)
    h = linear(head["transform"], hidden, dtype=dtype)
    h = jax.nn.gelu(h.astype(jnp.float32))
    h = layer_norm(head["ln"], h, eps=1e-12)
    table = text_params["bert"]["embeddings"]["word"].astype(jnp.float32)
    return h @ table.T + head["bias"]


def apply_bert_masking(rng, ids, mask, *, mask_id: int, vocab_size: int,
                       n_special: int = 5, p_select: float = 0.15):
    """Standard 80/10/10 BERT masking on device.

    Returns (masked_ids, labels, selected) where ``selected`` marks loss
    positions; special tokens (ids < n_special) and padding never select.
    """
    k_sel, k_kind, k_rand = jax.random.split(rng, 3)
    maskable = (mask > 0) & (ids >= n_special)
    selected = (jax.random.uniform(k_sel, ids.shape) < p_select) & maskable
    kind = jax.random.uniform(k_kind, ids.shape)
    rand_tok = jax.random.randint(k_rand, ids.shape, n_special, vocab_size)
    replaced = jnp.where(kind < 0.8, mask_id,
                         jnp.where(kind < 0.9, rand_tok, ids))
    return jnp.where(selected, replaced, ids), ids, selected


class MLMPretrainer:
    STAGE = "mlm"

    def __init__(self, cfg: Config, experiment_name: str = "pokemon"):
        self.cfg = cfg
        self.stage_dir = Path(cfg.experiment_dir) / f"{experiment_name}_mlm"
        self.ckpt = CheckpointManager(self.stage_dir / "checkpoints",
                                      self.STAGE)
        self.log = setup_logging(self.stage_dir / "logs", self.STAGE)
        self.metrics = MetricsWriter(self.stage_dir / "logs")

        from psg_tpu.data.dataset import PokemonDataset
        from psg_tpu.train.stage1_vae import bert_config_for, get_tokenizer

        ds = PokemonDataset(cfg.data.csv_path, cfg.data.image_dir,
                            image_size=cfg.data.image_size,
                            background_color=cfg.data.background_color,
                            text_len=cfg.data.text_len)
        self.tokenizer = get_tokenizer(cfg, self.stage_dir,
                                       corpus=ds.full_descriptions)
        self.bert_cfg = bert_config_for(cfg, self.tokenizer.vocab_size)

        # corpus = canonical captions + K augmentation variants each (the
        # same generator the diffusion stage uses, name always preserved:
        # MLM wants maximal wording diversity, not a conditioning contract)
        extra = cfg.extra or {}
        k_var = int(extra.get("mlm_caption_augment", 8) or 0)
        texts = list(ds.full_descriptions)
        if k_var > 0:
            from psg_tpu.data.caption_augment import caption_variants

            variants = caption_variants(
                ds.full_descriptions, k_var,
                int(extra.get("caption_aug_seed", cfg.seed)),
                p_name_drop=float(extra.get("mlm_name_drop", 0.5)))
            for vlist in variants:
                texts.extend(vlist[1:])  # [0] is canonical, already present
        ids, attn = self.tokenizer.encode_batch(texts, cfg.data.text_len)
        # hold out a deterministic 5% of ROWS for val perplexity
        n = ids.shape[0]
        hold = np.random.RandomState(cfg.seed).permutation(n)
        n_val = max(1, n // 20)
        self.val_rows = (jnp.asarray(ids[hold[:n_val]]),
                         jnp.asarray(attn[hold[:n_val]]))
        self.train_rows = (jnp.asarray(ids[hold[n_val:]]),
                           jnp.asarray(attn[hold[n_val:]]))

        key = jax.random.PRNGKey(cfg.seed + 10)
        k_text, k_head, k_state = jax.random.split(key, 3)
        text_params = text_encoder_init(k_text, self.bert_cfg,
                                        cfg.model.text_embedding_dim)
        head = mlm_head_init(k_head, self.bert_cfg.hidden_size)
        head["bias"] = jnp.zeros((self.tokenizer.vocab_size,), jnp.float32)
        params = {"text": text_params, "mlm": head}

        o = cfg.optimization
        epochs = int(extra.get("mlm_epochs", 60))
        self.batch = int(extra.get("mlm_batch", 64))
        spe = max(1, self.train_rows[0].shape[0] // self.batch)
        self._steps_per_epoch = spe
        lr = float(extra.get("mlm_lr", 3e-4))
        sched = optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup_steps=min(500, epochs * spe // 10 + 1),
            decay_steps=max(epochs * spe, 2), end_value=lr * 0.1)
        self.tx = optax.chain(
            optax.clip_by_global_norm(o.max_grad_norm),
            optax.adamw(sched, b2=o.beta2, weight_decay=o.weight_decay),
        )
        self.state = TrainState.create(params, self.tx.init(params), k_state)
        self.epochs = epochs

        self._epoch_fn = jax.jit(self._epoch_impl, donate_argnums=(0,))
        self._val_fn = jax.jit(self._val_impl)

    # -- jitted ------------------------------------------------------------

    def _loss(self, params, ids, attn, rng):
        masked, labels, sel = apply_bert_masking(
            rng, ids, attn, mask_id=self.tokenizer.ids["[MASK]"],
            vocab_size=self.tokenizer.vocab_size)
        logits = mlm_logits(params["text"], params["mlm"], masked, attn,
                            self.bert_cfg, dtype=jnp.bfloat16)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        w = sel.astype(jnp.float32)
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)

    def _epoch_impl(self, state: TrainState, rows):
        ids_all, attn_all = rows
        n = ids_all.shape[0]

        def body(st, _):
            rng = jax.random.fold_in(st.rng, st.step)
            k_idx, k_mask = jax.random.split(rng)
            idx = jax.random.randint(k_idx, (self.batch,), 0, n)
            loss, grads = jax.value_and_grad(self._loss)(
                st.params, ids_all[idx], attn_all[idx], k_mask)
            updates, opt_state = self.tx.update(grads, st.opt_state,
                                               st.params)
            params = optax.apply_updates(st.params, updates)
            return TrainState(st.step + 1, params, opt_state, st.rng,
                              st.ema), loss

        return jax.lax.scan(body, state, None,
                            length=self._steps_per_epoch)

    def _val_impl(self, state: TrainState, rows):
        ids, attn = rows
        rng = jax.random.fold_in(state.rng, jnp.int32(-3))
        return self._loss(state.params, ids, attn, rng)

    # -- loop --------------------------------------------------------------

    def train(self) -> Path:
        self.log.info("stage 0 (MLM): %d epochs x %d steps, batch %d, "
                      "corpus %d rows, vocab %d", self.epochs,
                      self._steps_per_epoch, self.batch,
                      int(self.train_rows[0].shape[0]),
                      self.tokenizer.vocab_size)
        best = float("inf")
        t_start = time.time()
        for epoch in range(self.epochs):
            t0 = time.time()
            self.state, losses = self._epoch_fn(self.state, self.train_rows)
            tr = float(np.asarray(losses).mean())
            val = float(self._val_fn(self.state, self.val_rows))
            self.metrics.scalars({"loss": tr, "val": val},
                                 int(self.state.step), prefix="mlm/")
            if val < best:
                best = val
                self.ckpt.save({"params": {
                    "text": self.state.params["text"],
                    "mlm": self.state.params["mlm"]}},
                    int(self.state.step), val,
                    extra_meta={"epoch": epoch,
                                "config": self.cfg.to_dict()},
                    periodic=False)
            self.log.info(
                "epoch %d done in %.1fs: mlm %.4f val %.4f (ppl %.1f)",
                epoch, time.time() - t0, tr, val, float(np.exp(min(val, 20))))
        self.log.info("stage 0: %d epochs in %.1f min (best val %.4f)",
                      self.epochs, (time.time() - t_start) / 60.0, best)
        self.metrics.flush()
        return self.ckpt.best_path


def load_text_init(path, text_template):
    """Restore the ``text`` subtree from an MLM (or any) checkpoint onto a
    stage-1 template — the warm-start hook behind ``extra.text_init``."""
    from psg_tpu.core.checkpoint import load_params

    loaded = load_params(path, {"text": text_template})
    return loaded["text"]
