"""Diagnose the VAE color-desaturation issue (VERDICT r2 item 5).

Loads the stage-1 evidence checkpoint, reconstructs training sprites, and
prints per-channel statistics: is chroma lost at the encoder (mu), in the
decoder, or is it a rendering artifact?  Also reports recon chroma when the
latent is mu (no sampling noise) vs reparameterized.

Usage: python scripts/diag_vae_color.py [ckpt_path]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from psg_tpu.core.checkpoint import load_params
from psg_tpu.core.initutil import jit_init
from psg_tpu.models.bert import BertConfig
from psg_tpu.models.text_encoder import text_encoder_apply, text_encoder_init
from psg_tpu.models.unet import text_bias_from_mask
from psg_tpu.models.vae import (
    vae_decoder_apply,
    vae_encoder_apply,
    vae_init,
)
from psg_tpu.text import WordPieceTokenizer


def chroma(x):
    """Mean over pixels of (max-min across RGB) — 0 for grayscale."""
    x = np.asarray(x, np.float32)
    return float(np.mean(x.max(-1) - x.min(-1)))


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else \
        "experiments/evidence_vae/checkpoints/vae_best_model.ckpt"
    tok = WordPieceTokenizer.from_vocab_file("experiments/evidence_vae/vocab.txt")
    bert_cfg = BertConfig.base()._replace(vocab_size=tok.vocab_size)

    key = jax.random.PRNGKey(0)
    template = {
        "vae": jit_init(vae_init, key, 8, 768),
        "text": jit_init(text_encoder_init, key, bert_cfg, 768),
    }
    params = load_params(ckpt, template)
    print("loaded", ckpt)

    from psg_tpu.data.dataset import PokemonDataset

    ds = PokemonDataset("/root/reference/data/text_description_concat.csv",
                        "/root/reference/data/small_images",
                        image_size=215, background_color="white",
                        tokenizer=tok, text_len=128)
    n = 6
    imgs = ds.images[:n].astype(np.float32) / 127.5 - 1.0
    ids, mask = ds.text_ids[:n], ds.text_mask[:n]

    @jax.jit
    def run(params, imgs, ids, mask):
        text_emb = text_encoder_apply(params["text"], ids, mask, bert_cfg,
                                      dtype=jnp.bfloat16)
        mu, logvar = vae_encoder_apply(params["vae"]["encoder"], imgs,
                                       dtype=jnp.bfloat16)
        bias = text_bias_from_mask(mask)
        recon_mu = vae_decoder_apply(params["vae"]["decoder"], mu, text_emb,
                                     text_bias=bias, image_size=215,
                                     dtype=jnp.bfloat16)
        z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(
            jax.random.PRNGKey(7), mu.shape)
        recon_z = vae_decoder_apply(params["vae"]["decoder"], z, text_emb,
                                    text_bias=bias, image_size=215,
                                    dtype=jnp.bfloat16)
        # decoder with ZERO text (does cross-attn carry the color?)
        recon_nt = vae_decoder_apply(params["vae"]["decoder"], mu,
                                     jnp.zeros_like(text_emb),
                                     text_bias=bias, image_size=215,
                                     dtype=jnp.bfloat16)
        return text_emb, mu, logvar, recon_mu, recon_z, recon_nt

    text_emb, mu, logvar, recon_mu, recon_z, recon_nt = jax.device_get(
        run(params, jnp.asarray(imgs), jnp.asarray(ids), jnp.asarray(mask)))

    img01 = (imgs + 1) / 2
    rm01 = (np.asarray(recon_mu, np.float32) + 1) / 2
    rz01 = (np.asarray(recon_z, np.float32) + 1) / 2
    rn01 = (np.asarray(recon_nt, np.float32) + 1) / 2
    print(f"original   chroma {chroma(img01):.4f}  per-ch mean {img01.mean((0,1,2))}")
    print(f"recon(mu)  chroma {chroma(rm01):.4f}  per-ch mean {rm01.mean((0,1,2))}")
    print(f"recon(z)   chroma {chroma(rz01):.4f}")
    print(f"recon(0txt)chroma {chroma(rn01):.4f}")
    print(f"recon MAE  {np.abs(rm01-img01).mean():.4f}  "
          f"per-ch MAE {np.abs(rm01-img01).mean((0,1,2))}")
    print(f"mu    std {np.asarray(mu, np.float32).std():.4f}  "
          f"logvar mean {np.asarray(logvar, np.float32).mean():.4f}")
    print(f"text_emb std {np.asarray(text_emb, np.float32).std():.4f}")

    from psg_tpu.utils.images import save_image_grid

    inter = np.stack([x for pair in zip(imgs, np.asarray(recon_mu, np.float32))
                      for x in pair])
    save_image_grid(inter, "/tmp/diag_vae_recon.png", ncols=4)
    print("wrote /tmp/diag_vae_recon.png")


if __name__ == "__main__":
    main()
