"""Third-stage NaN localization: is the fused spatial_xattn backward the
source of the stage-1 text-encoder NaN gradients?

Runs the SAME batch/step twice — once with the fused Pallas spatial
attention (default on TPU) and once forced to the XLA path — and reports
per-component grad finiteness plus the gradient at text_emb itself
(the seam between the VAE decoder backward and the BERT backward).

Usage: python scripts/diag_stage1_nan3.py
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from psg_tpu.core.config import load_config
from psg_tpu.train.stage1_vae import VAETrainer


def main():
    overrides = [
        "data.batch_size=8", "training.sample_every=1000000",
        "training.best_every=1000000", "training.save_every=1000000",
        "optimization.skip_grad_norm=0", "optimization.learning_rate=0.0003",
        "optimization.warmup_steps=300", "optimization.ema_decay=0",
    ]
    cfg = load_config("config/r3_evidence.yaml", overrides=overrides)
    cfg.experiment_dir = "/tmp/diag_nan"
    t = VAETrainer(cfg, experiment_name="diag")
    t.load_checkpoint(
        "experiments/evidence_r3_vae/checkpoints/vae_step_00004500.ckpt")
    t._setup_fast_data()
    data = t._train_data

    from psg_tpu.data.device_augment import normalize_batch
    from psg_tpu.models.text_encoder import text_encoder_apply
    from psg_tpu.models.unet import text_bias_from_mask
    from psg_tpu.models.vae import vae_apply
    from psg_tpu.models.losses import vae_loss
    from psg_tpu.train.fastpath import draw_minibatch

    n = data["images"].shape[0]
    klw = jnp.float32(t.kl_weight(50))

    def make_step():
        # traced under the CURRENT env (fused vs xla attention)
        def one_step(params, vgg, data, i):
            rng = jax.random.fold_in(t.state.rng, 4500 + i)
            k_idx, _, k_loss = jax.random.split(rng, 3)
            idx = draw_minibatch(k_idx, n, cfg.data.batch_size)
            batch = {"image": normalize_batch(data["images"][idx]),
                     "text_ids": data["text_ids"][idx],
                     "text_mask": data["text_mask"][idx]}

            def loss_fn(p, text_emb_delta):
                text_emb = text_encoder_apply(
                    p["text"], batch["text_ids"], batch["text_mask"],
                    t.bert_cfg, dtype=t.compute_dtype)
                text_emb = text_emb + text_emb_delta
                text_bias = text_bias_from_mask(batch["text_mask"])
                out = vae_apply(p["vae"], k_loss, batch["image"], text_emb,
                                "train", latent_dim=cfg.model.latent_dim,
                                latent_size=t.latent_size,
                                text_bias=text_bias, dtype=t.compute_dtype)
                loss, _ = vae_loss(
                    vgg, out["reconstructed"], batch["image"],
                    out["mu"], out["logvar"],
                    reconstruction_weight=cfg.training.reconstruction_weight,
                    perceptual_weight=cfg.training.perceptual_weight,
                    kl_weight=klw, dtype=t.compute_dtype)
                return loss

            zero = jnp.zeros(
                (cfg.data.batch_size, cfg.data.text_len,
                 cfg.model.text_embedding_dim),
                t.compute_dtype or jnp.float32)
            loss, (grads, g_emb) = jax.value_and_grad(
                loss_fn, argnums=(0, 1))(params, zero)

            def stats(tree):
                leaves = jax.tree_util.tree_leaves(tree)
                bad = sum(jnp.sum(~jnp.isfinite(x)) for x in leaves)
                mx = jnp.max(jnp.asarray(
                    [jnp.max(jnp.abs(jnp.where(jnp.isfinite(x), x, 0.0)))
                     for x in leaves]))
                return bad, mx

            b_enc, m_enc = stats(grads["vae"]["encoder"])
            b_dec, m_dec = stats(grads["vae"]["decoder"])
            b_txt, m_txt = stats(grads["text"])
            b_emb, m_emb = stats(g_emb)
            return {"loss": loss, "bad_enc": b_enc, "max_enc": m_enc,
                    "bad_dec": b_dec, "max_dec": m_dec,
                    "bad_text": b_txt, "max_text": m_txt,
                    "bad_emb": b_emb, "max_emb": m_emb}

        return jax.jit(one_step)

    for mode in ("pallas-default", "xla"):
        os.environ["PSG_TPU_SPATIAL_ATTN"] = (
            "" if mode == "pallas-default" else "xla")
        step = make_step()
        for i in (0, 1, 2):
            r = jax.device_get(step(t.state.params, t.vgg_params, data,
                                    jnp.int32(i)))
            print(f"[{mode}] step {i}: loss={float(r['loss']):.4f} "
                  f"bad enc/dec/text/emb = {int(r['bad_enc'])}/"
                  f"{int(r['bad_dec'])}/{int(r['bad_text'])}/"
                  f"{int(r['bad_emb'])} "
                  f"max enc/dec/text/emb = {float(r['max_enc']):.2e}/"
                  f"{float(r['max_dec']):.2e}/{float(r['max_text']):.2e}/"
                  f"{float(r['max_emb']):.2e}")


if __name__ == "__main__":
    main()
