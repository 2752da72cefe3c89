"""Stage-2 alternative: SD-1.5-family UNet + trainable text encoder.

Covers the reference DiffusersTrainer (src/training/diffusers_trainer.py,
selected by ``train_3stage.py --use-diffusers``):

- backbone: the SD UNet wrapper (psg_tpu.models.sd_unet) adapted to
  8-channel latents, with pretrained weights via convert_sd_unet when a
  diffusers checkpoint file is available (random init fallback,
  diffusers_trainer.py:258-269);
- the text encoder TRAINS alongside the UNet (unlike the custom-UNet
  stage 2), with text lr = text_encoder_lr or 0.1x unet lr
  (diffusers_trainer.py:372-373) and text grad clip at 0.5x the unet's
  (:546-554);
- conditioning text is the bare ``description`` (not full_description,
  :490);
- MSE noise loss (:406,534); cosine beta schedule (:34-48);
- sampling uses the x0-prediction posterior-variance sampler (:76-100).

The reference's MPS memory management (:169-187, periodic empty_cache)
has no TPU analog — XLA owns HBM; see psg_tpu.utils.memory for the
planning tools that replace it.
"""

from __future__ import annotations

import os
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from psg_tpu.core.checkpoint import CheckpointManager, load_metadata, load_state
from psg_tpu.core.config import Config
from psg_tpu.core.initutil import jit_init
from psg_tpu.core.metrics import MetricsWriter, Throughput, setup_logging
from psg_tpu.core.stability import global_norm
from psg_tpu.data import make_loaders
from psg_tpu.diffusion import make_schedule
from psg_tpu.diffusion.sampling import ddpm_sample_x0
from psg_tpu.models.losses import mse_loss
from psg_tpu.models.sd_unet import (
    SDUNetSpec,
    sd_training_mask,
    sd_wrapper_apply,
    sd_wrapper_init,
)
from psg_tpu.models.text_encoder import (
    finetune_mask,
    text_encoder_apply,
    text_encoder_init,
)
from psg_tpu.models.unet import text_bias_from_mask
from psg_tpu.models.vae import (
    latent_size_for,
    reparameterize,
    vae_decode,
    vae_encoder_apply,
    vae_init,
)
from psg_tpu.train.optim import build_optimizer, labels_from_mask, make_lr_schedule
from psg_tpu.train.stage1_vae import bert_config_for, get_tokenizer
from psg_tpu.train.state import TrainState
from psg_tpu.utils.images import save_image_grid


def sd_spec_from_config(cfg: Config) -> SDUNetSpec:
    m = cfg.model
    if "tiny-test" in m.bert_model:
        return SDUNetSpec.tiny_test(text_dim=m.cross_attention_dim)
    return SDUNetSpec.sd15()._replace(
        cross_attention_dim=m.cross_attention_dim)


class SDDiffusionTrainer:
    """DiffusersTrainer equivalent (--use-diffusers stage 2)."""

    STAGE = "diffusers"

    def __init__(self, cfg: Config, vae_checkpoint_path,
                 experiment_name: str = "pokemon", mesh=None):
        self.cfg = cfg
        self.mesh = mesh
        self.stage_dir = Path(cfg.experiment_dir) / f"{experiment_name}_diffusers"
        self.ckpt = CheckpointManager(self.stage_dir / "checkpoints", self.STAGE)
        self.log = setup_logging(self.stage_dir / "logs", self.STAGE)
        self.metrics = MetricsWriter(self.stage_dir / "logs")

        from psg_tpu.data.dataset import PokemonDataset

        ds = PokemonDataset(cfg.data.csv_path, cfg.data.image_dir,
                            image_size=cfg.data.image_size,
                            background_color=cfg.data.background_color,
                            text_len=cfg.data.text_len)
        self.tokenizer = get_tokenizer(cfg, self.stage_dir,
                                       corpus=ds.full_descriptions)
        self.train_loader, self.val_loader, self.test_loader, self.ds = make_loaders(
            cfg, self.tokenizer, ds=ds)

        self.bert_cfg = bert_config_for(cfg, self.tokenizer.vocab_size)
        self.compute_dtype = (
            jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else None
        )
        self.latent_size = latent_size_for(cfg.data.image_size)
        self.spec = sd_spec_from_config(cfg)

        m = cfg.model
        self.schedule = make_schedule(m.num_timesteps, m.beta_start, m.beta_end,
                                      "cosine")

        # frozen VAE + trainable text encoder from the stage-1 checkpoint
        key = jax.random.PRNGKey(cfg.seed)
        k_vae, k_text, k_sd, k_state = jax.random.split(key, 4)
        vae_params = jit_init(vae_init, k_vae, m.latent_dim, m.text_embedding_dim,
                              width_scale=m.vae_width_scale)
        text_params = jit_init(text_encoder_init, k_text, self.bert_cfg,
                               m.text_embedding_dim)
        # recorded in every sidecar for paired serving resolution (ADVICE r3)
        self.vae_ckpt_path = (str(vae_checkpoint_path)
                              if vae_checkpoint_path else None)
        if vae_checkpoint_path and Path(vae_checkpoint_path).exists():
            from psg_tpu.core.checkpoint import load_params

            restored = load_params(vae_checkpoint_path,
                                   {"vae": vae_params, "text": text_params})
            vae_params = restored["vae"]
            text_params = restored["text"]
            self.log.info("loaded VAE+text from %s", vae_checkpoint_path)
        self.frozen_vae = jax.device_put(vae_params)

        # SD UNet wrapper: pretrained diffusers weights if a converted /
        # torch checkpoint is available, else random init
        base = self._load_sd_base()
        sd_params = sd_wrapper_init(k_sd, self.spec, m.text_embedding_dim,
                                    latent_dim=m.latent_dim, base_params=base)
        params = {"sd": sd_params, "text": text_params}

        # optimizer: unet group + text group (0.5x clip), frozen-by-mode
        o = cfg.optimization
        if (cfg.extra or {}).get("prediction_type", "eps") != "eps":
            # the SD-family trainer keeps the reference's eps semantics;
            # v-prediction lives in the custom-UNet trainer — refuse
            # rather than silently train eps under a sidecar that says v
            raise ValueError("extra.prediction_type != 'eps' is not "
                             "supported by the SD trainer")
        uo = cfg.extra.get("unet_optimization", {}) if cfg.extra else {}
        unet_lr = uo.get("learning_rate", o.learning_rate)
        text_lr = o.text_encoder_lr or unet_lr * 0.1
        spe = max(len(self.train_loader), 1)
        total = cfg.training.diffusion_epochs * spe
        kind = "onecycle" if uo.get("scheduler", o.scheduler) == "cosine" else \
            uo.get("scheduler", o.scheduler)
        unet_sched = make_lr_schedule(kind, unet_lr, total_steps=total,
                                      steps_per_epoch=spe,
                                      pct_start=o.onecycle_pct_start,
                                      warmup_steps=uo.get("warmup_steps",
                                                          o.warmup_steps),
                                      end_factor=o.lr_end_factor)
        text_sched = make_lr_schedule(kind, text_lr, total_steps=total,
                                      steps_per_epoch=spe,
                                      pct_start=o.onecycle_pct_start,
                                      warmup_steps=uo.get("warmup_steps",
                                                          o.warmup_steps),
                                      end_factor=o.lr_end_factor)

        train_mode = ("cross_attention_only"
                      if (m.freeze_encoder and m.freeze_decoder)
                      else "decoder_only" if m.freeze_encoder else "full")
        sd_labels = labels_from_mask(sd_training_mask(sd_params, train_mode), "unet")
        text_labels = labels_from_mask(
            finetune_mask(text_params, self.bert_cfg, m.bert_finetune_strategy),
            "text")
        self.tx = build_optimizer(
            o,
            {
                "unet": {"lr_schedule": unet_sched,
                         "max_grad_norm": o.max_grad_norm},
                # text clip at 0.5x the unet's (diffusers_trainer.py:552)
                "text": {"lr_schedule": text_sched,
                         "max_grad_norm": o.max_grad_norm * 0.5},
            },
            {"sd": sd_labels, "text": text_labels},
        )
        self.state = TrainState.create(params, self.tx.init(params), k_state)
        if mesh is not None:
            # DP over 'data'; with model>1 the wide SD-UNet kernels (and
            # Adam moments) shard their channel axis over 'model'
            from psg_tpu.parallel import replicated, shard_state, unet_tp_rules

            rule = None
            if mesh.shape.get("model", 1) > 1:
                rule = unet_tp_rules(int((cfg.extra or {}).get(
                    "tp_min_channels", 640)))
            self.state = shard_state(self.state, mesh, rule)
            self.frozen_vae = jax.device_put(self.frozen_vae, replicated(mesh))
        self.start_epoch = 0
        self.best_val = float("inf")

        self._train_step = jax.jit(self._step, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval)
        self._sample_fn = jax.jit(self._sample, static_argnames=("num", "steps"))

    def _load_sd_base(self):
        path = os.environ.get("PSG_TPU_SD_UNET", "weights/sd15_unet.ckpt")
        if Path(path).exists():
            from psg_tpu.models.sd_unet import sd_unet_init

            tmpl = jit_init(sd_unet_init, jax.random.PRNGKey(0), self.spec)
            self.log.info("loading pretrained SD UNet from %s", path)
            return load_state(path, tmpl)
        if path.endswith(".pth") or path.endswith(".bin"):
            from psg_tpu.models.convert import (
                convert_sd_unet,
                load_torch_state_dict,
            )

            return convert_sd_unet(load_torch_state_dict(path))
        self.log.warning("no pretrained SD UNet found — random init "
                         "(diffusers_trainer.py:258-269 fallback semantics)")
        return None

    # -- jitted fns ----------------------------------------------------------

    def _noise_loss(self, params, frozen_vae, batch, rng, sample_weights=None):
        # conditioning on the bare description (diffusers_trainer.py:490)
        text_emb = text_encoder_apply(params["text"], batch["desc_ids"],
                                      batch["desc_mask"], self.bert_cfg,
                                      dtype=self.compute_dtype)
        mu, logvar = vae_encoder_apply(frozen_vae["encoder"], batch["image"],
                                       dtype=self.compute_dtype)
        k_rep, k_t, k_n = jax.random.split(rng, 3)
        latent = reparameterize(k_rep, mu, logvar)
        latent = jax.lax.stop_gradient(
            jnp.clip(latent, -self.cfg.model.latent_clamp,
                     self.cfg.model.latent_clamp))
        b = latent.shape[0]
        t = jax.random.randint(k_t, (b,), 0, self.schedule.num_timesteps)
        noise = jax.random.normal(k_n, latent.shape, jnp.float32)
        noisy = self.schedule.add_noise(latent, noise, t)
        pred = sd_wrapper_apply(params["sd"], noisy.astype(text_emb.dtype), t,
                                text_emb, self.spec,
                                text_bias=text_bias_from_mask(batch["desc_mask"]),
                                dtype=self.compute_dtype)
        return mse_loss(pred, noise, sample_weights=sample_weights)  # (:406,534)

    def _step(self, state: TrainState, frozen_vae, batch):
        rng = jax.random.fold_in(state.rng, state.step)

        def loss_fn(p):
            return self._noise_loss(p, frozen_vae, batch, rng)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(state.step + 1, params, opt_state, state.rng),
                {"loss": loss, "grad_norm": global_norm(grads)})

    def _eval(self, state: TrainState, frozen_vae, batch, valid):
        # mask wraparound-padded tail samples so val loss is exact
        rng = jax.random.fold_in(state.rng, jnp.int32(-4))
        w = (jnp.arange(batch["image"].shape[0]) < valid).astype(jnp.float32)
        return {"loss": self._noise_loss(state.params, frozen_vae, batch, rng,
                                         sample_weights=w)}

    def _sample(self, params, frozen_vae, rng, text_ids, text_mask, *,
                num: int, steps: int = 50):
        text_emb = text_encoder_apply(params["text"], text_ids, text_mask,
                                      self.bert_cfg, dtype=self.compute_dtype)
        bias = text_bias_from_mask(text_mask)

        def denoise(x, t):
            return sd_wrapper_apply(params["sd"], x.astype(text_emb.dtype), t,
                                    text_emb, self.spec, text_bias=bias,
                                    dtype=self.compute_dtype)

        shape = (num, self.latent_size, self.latent_size, self.cfg.model.latent_dim)
        latents = ddpm_sample_x0(denoise, self.schedule, rng, shape=shape,
                                 num_inference_steps=steps)
        return vae_decode(frozen_vae, latents.astype(text_emb.dtype), text_emb,
                          text_bias=bias, image_size=self.cfg.data.image_size,
                          dtype=self.compute_dtype)

    # -- loops ------------------------------------------------------------------

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        sums: Dict[str, float] = {}
        count = 0
        thr = Throughput()
        for batch in self.train_loader:
            b = {k: batch[k] for k in ("image", "desc_ids", "desc_mask")}
            if self.mesh is not None:
                from psg_tpu.parallel import shard_batch

                b = shard_batch(b, self.mesh)
            self.state, parts = self._train_step(self.state, self.frozen_vae, b)
            count += 1
            thr.step()
            if count % self.cfg.training.log_every == 0:
                vals = {k: float(v) for k, v in parts.items()}
                self.metrics.scalars(vals, int(self.state.step),
                                     prefix="diffusers_train/")
                self.log.info("epoch %d step %d loss %.4f | %.0f b/h", epoch,
                              int(self.state.step), vals["loss"],
                              thr.batches_per_hour())
            for k, v in parts.items():
                # accumulate device arrays — float() here would force a
                # host sync every step
                sums[k] = sums.get(k, 0.0) + v
        return {k: float(v) / max(count, 1) for k, v in sums.items()}

    def validate(self, epoch: int) -> float:
        total, n = 0.0, 0
        for batch in self.val_loader:
            valid = int(batch["valid"])
            b = {k: batch[k] for k in ("image", "desc_ids", "desc_mask")}
            if self.mesh is not None:
                from psg_tpu.parallel import shard_batch

                b = shard_batch(b, self.mesh)
            parts = self._eval_step(self.state, self.frozen_vae, b,
                                    jnp.int32(valid))
            total += float(parts["loss"]) * valid
            n += valid
        val = total / max(n, 1)
        self.metrics.scalar("diffusers_val/loss", val, int(self.state.step))
        return val

    def generate_samples(self, epoch: int, num: int = 8, steps: int = 50):
        descs = self.ds.descriptions[:num]
        ids, mask = self.tokenizer.encode_batch(descs, self.cfg.data.text_len)
        rng = jax.random.fold_in(self.state.rng, 40_000 + epoch)
        imgs = self._sample_fn(self.state.params, self.frozen_vae, rng,
                               jnp.asarray(ids), jnp.asarray(mask),
                               num=num, steps=steps)
        save_image_grid(np.asarray(imgs),
                        self.stage_dir / "samples" / f"epoch_{epoch:04d}.png",
                        captions=descs)

    def save_checkpoint(self, epoch: int, val_loss: float) -> bool:
        tr = self.cfg.training
        allow_best = ((epoch + 1) % max(tr.best_every, 1) == 0
                      or epoch + 1 == tr.diffusion_epochs)
        return self.ckpt.save(self.state, int(self.state.step),
                              val_loss if allow_best else None,
                              extra_meta={"epoch": epoch,
                                          "vae_checkpoint": self.vae_ckpt_path,
                                          "config": self.cfg.to_dict()},
                              periodic=((epoch + 1) % self.cfg.training.save_every == 0))

    def load_checkpoint(self, path: Optional[str] = None):
        if path is None:
            self.state, meta = self.ckpt.restore(self.state, best=True)
        else:
            self.state = load_state(path, self.state)
            meta = load_metadata(path)
        self.start_epoch = int(meta.get("epoch", -1)) + 1
        self.best_val = float(meta.get("metric", float("inf")))

    def train(self) -> Path:
        epochs = self.cfg.training.diffusion_epochs
        self.log.info("stage 2 (SD): %d epochs, %d batches/epoch", epochs,
                      len(self.train_loader))
        for epoch in range(self.start_epoch, epochs):
            t0 = time.time()
            self.train_loader.set_epoch(epoch)
            stats = self.train_epoch(epoch)
            val_loss = self.validate(epoch)
            if val_loss < self.best_val:
                self.best_val = val_loss
            self.save_checkpoint(epoch, val_loss)
            if (epoch + 1) % self.cfg.training.sample_every == 0:
                self.generate_samples(epoch)
            self.log.info("epoch %d done in %.1fs: train %.4f val %.4f", epoch,
                          time.time() - t0, stats.get("loss", 0.0), val_loss)
        self.metrics.flush()
        return self.ckpt.best_path
