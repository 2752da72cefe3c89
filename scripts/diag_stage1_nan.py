"""Localize the stage-1 sporadic NaN gradients seen in the r3 fast-path
run (epoch-mean grad_norm NaN from ~epoch 9; params poisoned ~epoch 77).

Resumes from the surviving periodic checkpoint, then runs scanned probe
steps that record per-step, per-component gradient finiteness/norms with
augmentation on and off.

Usage: python scripts/diag_stage1_nan.py [steps]
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


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 270
    overrides = [
        "data.batch_size=8", "training.sample_every=1000000",
        "training.best_every=1000000", "training.save_every=1000000",
        "optimization.skip_grad_norm=0", "optimization.learning_rate=0.0003",
        "optimization.warmup_steps=300", "optimization.beta2=0.999",
        "optimization.ema_decay=0",
    ]
    cfg = load_config("config/r3_evidence.yaml", overrides=overrides)
    cfg.experiment_dir = "/tmp/diag_nan"
    t = VAETrainer(cfg, experiment_name="diag")
    ckpt = "experiments/evidence_r3_vae/checkpoints/vae_step_00004500.ckpt"
    t.load_checkpoint(ckpt)
    print("resumed at step", int(t.state.step))
    t._setup_fast_data()
    data = t._train_data

    from psg_tpu.data.device_augment import augment_batch, normalize_batch
    from psg_tpu.train.fastpath import draw_minibatch

    n = data["images"].shape[0]
    bs = cfg.data.batch_size
    klw = jnp.float32(t.kl_weight(50))

    def probe(state_params, state_rng, vgg, data, augment: bool):
        def body(carry, i):
            rng = jax.random.fold_in(state_rng, 4500 + i)
            k_idx, k_aug, k_loss = jax.random.split(rng, 3)
            idx = draw_minibatch(k_idx, n, bs)
            imgs_u8 = data["images"][idx]
            imgs = (augment_batch(imgs_u8, k_aug, t.ds.background)
                    if augment else normalize_batch(imgs_u8))
            batch = {"image": imgs, "text_ids": data["text_ids"][idx],
                     "text_mask": data["text_mask"][idx]}

            def loss_fn(p):
                loss, _ = t._forward_loss(p, vgg, batch, k_loss, klw, "train")
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(state_params)

            def gn(tree):
                return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                                    for x in jax.tree_util.tree_leaves(tree)))

            out = {
                "loss": loss,
                "img_ok": jnp.all(jnp.isfinite(imgs)).astype(jnp.int32),
                "g_enc": gn(grads["vae"]["encoder"]),
                "g_dec": gn(grads["vae"]["decoder"]),
                "g_text": gn(grads["text"]),
            }
            return carry, out

        _, ys = jax.lax.scan(body, 0, jnp.arange(steps))
        return ys

    jprobe = jax.jit(probe, static_argnames=("augment",))
    for augment in (True, False):
        ys = jax.device_get(jprobe(t.state.params, t.state.rng, t.vgg_params,
                                   data, augment))
        loss = np.asarray(ys["loss"])
        print(f"augment={augment}: steps={steps} "
              f"loss nan={np.isnan(loss).sum()} "
              f"img bad={int(steps - ys['img_ok'].sum())}")
        for kname in ("g_enc", "g_dec", "g_text"):
            v = np.asarray(ys[kname])
            bad = ~np.isfinite(v)
            print(f"  {kname}: nonfinite={bad.sum()} "
                  f"max={np.nanmax(v[np.isfinite(v)]) if np.isfinite(v).any() else 'none':} "
                  f"first_bad_step={np.argmax(bad) if bad.any() else -1}")


if __name__ == "__main__":
    main()
