"""x0-prediction diagnostic for a stage-2 checkpoint.

Separates two failure modes that look identical in prior-sample grids
(textured blobs, no silhouettes):
  (a) the UNet has not learned structured denoising at all, vs
  (b) denoising of REAL latents is healthy and only generation from the
      prior is immature (training further fixes it).

For a few sprites: encode -> q_sample to several t -> eps-predict ->
reconstruct x0_hat -> decode.  Writes a grid; each sprite contributes
rows [original | decode(z) | decode(x0_hat @ t for t in ...)].  Healthy
training shows recognizable sprites from large-t x0_hat.

Usage: python scripts/diag_x0.py [experiment_prefix] [out.png]
(defaults: experiments/evidence_r3b, /tmp/diag_x0.png)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    exp = sys.argv[1] if len(sys.argv) > 1 else "experiments/evidence_r3b"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/diag_x0.png"
    ts = (200, 500, 800)

    from psg_tpu.core.config import load_config
    from psg_tpu.data.dataset import PokemonDataset
    from psg_tpu.data.device_augment import normalize_batch
    from psg_tpu.diffusion import make_schedule
    from psg_tpu.models.text_encoder import text_encoder_apply
    from psg_tpu.models.unet import text_bias_from_mask, unet_apply
    from psg_tpu.models.vae import reparameterize, vae_decode, vae_encoder_apply
    from psg_tpu.serve.generator import PokemonGenerator
    from psg_tpu.utils.images import save_image_grid

    cfg = load_config("config/r3_evidence.yaml")
    gen = PokemonGenerator(
        cfg,
        vae_checkpoint=f"{exp}_vae/checkpoints/vae_best_model.ckpt",
        diffusion_checkpoint=f"{exp}_diffusion/checkpoints/diffusion_best_model.ckpt",
    )
    # training used the config's (cosine) schedule — match it here, not
    # serving's linear one
    m = cfg.model
    schedule = make_schedule(m.num_timesteps, m.beta_start, m.beta_end,
                             m.beta_schedule)

    ds = PokemonDataset(cfg.data.csv_path, cfg.data.image_dir,
                        image_size=cfg.data.image_size,
                        text_len=cfg.data.text_len, tokenizer=gen.tokenizer)
    idx = np.array([3, 24, 149, 387])
    imgs = normalize_batch(jnp.asarray(ds.images[idx]))
    ids = jnp.asarray(ds.text_ids[idx])
    mask = jnp.asarray(ds.text_mask[idx])
    spec, bert_cfg, params = gen.spec, gen.bert_cfg, gen.params
    clamp = m.latent_clamp

    @jax.jit
    def run(params, imgs, ids, mask, rng):
        emb = text_encoder_apply(params["text"], ids, mask, bert_cfg,
                                 dtype=jnp.bfloat16)
        bias = text_bias_from_mask(mask)
        mu, logvar = vae_encoder_apply(params["vae"]["encoder"], imgs,
                                       dtype=jnp.bfloat16)
        k_rep, k_noise = jax.random.split(rng)
        z = jnp.clip(reparameterize(k_rep, mu.astype(jnp.float32),
                                    logvar.astype(jnp.float32)), -clamp, clamp)
        dec = lambda lat: vae_decode(params["vae"], lat.astype(jnp.bfloat16),
                                     emb, text_bias=bias,
                                     image_size=cfg.data.image_size,
                                     dtype=jnp.bfloat16)
        outs = [dec(z)]
        noise = jax.random.normal(k_noise, z.shape, jnp.float32)
        for t in ts:
            tv = jnp.full((z.shape[0],), t, jnp.int32)
            noisy = schedule.add_noise(z, noise, tv)
            eps = unet_apply(params["unet"], noisy.astype(jnp.bfloat16), tv,
                             emb, spec, text_mask=mask,
                             dtype=jnp.bfloat16).astype(jnp.float32)
            ab = schedule.alphas_cumprod[tv][:, None, None, None]
            x0 = (noisy - jnp.sqrt(1.0 - ab) * eps) / jnp.sqrt(ab)
            outs.append(dec(jnp.clip(x0, -clamp, clamp)))
        return outs

    outs = run(params, imgs, ids, mask, jax.random.PRNGKey(7))
    cols = 2 + len(ts)
    rows = []
    orig = np.asarray(imgs, np.float32)
    for i in range(len(idx)):
        rows.append(orig[i])
        for o in outs:
            rows.append(np.asarray(o[i], np.float32))
    save_image_grid(np.stack(rows), out, ncols=cols)
    print(f"wrote {out}  (cols: orig, recon, "
          + ", ".join(f"x0@t={t}" for t in ts) + ")")
    return 0


if __name__ == "__main__":
    sys.exit(main())
