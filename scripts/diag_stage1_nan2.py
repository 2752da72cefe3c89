"""Per-leaf localization of the stage-1 NaN gradients (follow-up to
diag_stage1_nan.py): one step's gradient tree, named nonfinite leaves.

Usage: python scripts/diag_stage1_nan2.py
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
    from psg_tpu.train.fastpath import draw_minibatch

    n = data["images"].shape[0]
    klw = jnp.float32(t.kl_weight(50))

    def one_step(params, vgg, data, i):
        rng = jax.random.fold_in(t.state.rng, 4500 + i)
        k_idx, _, k_loss = jax.random.split(rng, 3)
        idx = draw_minibatch(k_idx, n, cfg.data.batch_size)
        batch = {"image": normalize_batch(data["images"][idx]),
                 "text_ids": data["text_ids"][idx],
                 "text_mask": data["text_mask"][idx]}

        def loss_fn(p):
            loss, parts = t._forward_loss(p, vgg, batch, k_loss, klw, "train")
            return loss, parts

        (loss, parts), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        bad = jax.tree_util.tree_map(
            lambda g: jnp.sum(~jnp.isfinite(g)), grads)
        return loss, parts, bad

    jstep = jax.jit(one_step, static_argnames=())
    for i in (0, 1, 2, 5):
        loss, parts, bad = jax.device_get(
            jstep(t.state.params, t.vgg_params, data, jnp.int32(i)))
        flat = jax.tree_util.tree_flatten_with_path(bad)[0]
        bad_leaves = [(jax.tree_util.keystr(k), int(v))
                      for k, v in flat if int(v) > 0]
        print(f"step {i}: loss={float(loss):.4f} "
              f"parts={ {k: round(float(v),5) for k,v in parts.items()} } "
              f"nonfinite_leaves={len(bad_leaves)}")
        for kk, vv in bad_leaves[:12]:
            print("   ", kk, vv)


if __name__ == "__main__":
    main()
