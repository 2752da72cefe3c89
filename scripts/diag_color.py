"""Diagnose the VAE color-desaturation finding (VERDICT r2 item 2).

Two probes:

1. recon-chroma: reconstruct val sprites with the r3 best checkpoint
   ('generate' mode, deterministic) and compare per-image chroma
   (mean over pixels of max-min across RGB) input vs recon.
2. overfit: train a FRESH full-width VAE on 8 fixed sprites for N steps
   with no augmentation and no perceptual term.  A healthy architecture
   memorizes color in a few hundred steps; chroma staying near zero
   localizes a structural bug (loss/grads/decoder), chroma appearing
   means the full-data runs are under-trained or perturbed by
   augmentation/perceptual terms.

Usage: python scripts/diag_color.py [overfit_steps]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from psg_tpu.core.config import load_config
from psg_tpu.train.stage1_vae import VAETrainer


def chroma(img01):
    """img01 [..., H, W, 3] in [0,1] -> scalar mean chroma per image."""
    return np.asarray(
        (img01.max(-1) - img01.min(-1)).mean(axis=(-1, -2)))


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    overrides = [
        "data.batch_size=8", "data.augment=false",
        "training.perceptual_weight=0.0",
        "training.sample_every=1000000", "training.best_every=1000000",
        "training.save_every=1000000", "optimization.skip_grad_norm=0",
        "optimization.learning_rate=0.0003", "optimization.warmup_steps=100",
        "optimization.scheduler=constant",
    ]
    cfg = load_config("config/r3_evidence.yaml", overrides=overrides)
    cfg.experiment_dir = "/tmp/diag_color"
    t = VAETrainer(cfg, experiment_name="diag")

    # --- probe 1: recon chroma with the trained r3 best checkpoint -----------
    best = Path("experiments/evidence_r3_vae/checkpoints/vae_best_model.ckpt")
    if best.exists():
        from psg_tpu.core.checkpoint import load_params

        params = load_params(best, t.state.params)
        from psg_tpu.data.device_augment import normalize_batch
        from psg_tpu.models.text_encoder import text_encoder_apply
        from psg_tpu.models.unet import text_bias_from_mask
        from psg_tpu.models.vae import vae_apply

        idx = np.asarray(t.val_loader.indices[:8])
        imgs = normalize_batch(jnp.asarray(t.ds.images[idx]))
        ids = jnp.asarray(t.ds.text_ids[idx])
        mask = jnp.asarray(t.ds.text_mask[idx])

        @jax.jit
        def recon(p, imgs, ids, mask):
            emb = text_encoder_apply(p["text"], ids, mask, t.bert_cfg,
                                     dtype=t.compute_dtype)
            out = vae_apply(p["vae"], jax.random.PRNGKey(0), imgs, emb,
                            "generate", latent_size=t.latent_size,
                            text_bias=text_bias_from_mask(mask),
                            dtype=t.compute_dtype)
            return out["reconstructed"]

        r = np.asarray(recon(params, imgs, ids, mask), np.float32)
        i01 = (np.asarray(imgs, np.float32) + 1) / 2
        r01 = (r + 1) / 2
        print("probe1 (r3 best ckpt): input chroma",
              np.round(chroma(i01), 3).tolist())
        print("probe1 (r3 best ckpt): recon chroma",
              np.round(chroma(r01), 3).tolist())
        print("probe1 recon L1:",
              float(np.abs(r01 - i01).mean()))
        from psg_tpu.utils.images import save_image_grid

        inter = np.stack([i01, r01], 1).reshape((-1,) + i01.shape[1:])
        save_image_grid(inter * 2 - 1, "/tmp/diag_color/best_recon.png")

    # --- probe 2: overfit 8 sprites from scratch -----------------------------
    t._setup_fast_data()
    data = {k: v[:8] for k, v in t._train_data.items()}
    from psg_tpu.data.device_augment import normalize_batch

    klw = jnp.float32(t.kl_weight(50))

    def run(state, vgg, data, nsteps):
        batch = {"image": normalize_batch(data["images"]),
                 "text_ids": data["text_ids"], "text_mask": data["text_mask"]}

        def body(st, i):
            k_loss = jax.random.fold_in(st.rng, i)

            def loss_fn(p):
                return t._forward_loss(p, vgg, batch, k_loss, klw, "train")

            (loss, parts), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(st.params)
            import optax

            updates, opt_state = t.tx.update(grads, st.opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            from psg_tpu.train.state import TrainState

            return TrainState(st.step + 1, params, opt_state, st.rng,
                              st.ema), {"loss": loss,
                                        "recon": parts["reconstruction_loss"]}

        return jax.lax.scan(body, state, jnp.arange(nsteps))

    jrun = jax.jit(run, static_argnums=(3,), donate_argnums=(0,))
    state = t.state
    for chunk in range(max(steps // 500, 1)):
        state, ys = jrun(state, t.vgg_params, data, 500)
        loss = np.asarray(ys["loss"])
        print(f"overfit steps {(chunk+1)*500}: loss last50 "
              f"{loss[-50:].mean():.4f} nan={np.isnan(loss).sum()}")

    # reconstruct the 8 training sprites in generate mode
    from psg_tpu.models.text_encoder import text_encoder_apply
    from psg_tpu.models.unet import text_bias_from_mask
    from psg_tpu.models.vae import vae_apply

    imgs = normalize_batch(data["images"])

    @jax.jit
    def recon2(p, imgs, ids, mask):
        emb = text_encoder_apply(p["text"], ids, mask, t.bert_cfg,
                                 dtype=t.compute_dtype)
        out = vae_apply(p["vae"], jax.random.PRNGKey(0), imgs, emb,
                        "generate", latent_size=t.latent_size,
                        text_bias=text_bias_from_mask(mask),
                        dtype=t.compute_dtype)
        return out["reconstructed"]

    r = np.asarray(recon2(state.params, imgs, data["text_ids"],
                          data["text_mask"]), np.float32)
    i01 = (np.asarray(imgs, np.float32) + 1) / 2
    r01 = (r + 1) / 2
    print("probe2 (overfit): input chroma", np.round(chroma(i01), 3).tolist())
    print("probe2 (overfit): recon chroma", np.round(chroma(r01), 3).tolist())
    print("probe2 recon L1:", float(np.abs(r01 - i01).mean()))
    from psg_tpu.utils.images import save_image_grid

    inter = np.stack([i01, r01], 1).reshape((-1,) + i01.shape[1:])
    save_image_grid(inter * 2 - 1, "/tmp/diag_color/overfit_recon.png")


if __name__ == "__main__":
    main()
