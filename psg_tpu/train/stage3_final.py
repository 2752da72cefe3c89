"""Stage 3: text-encoder fine-tune + optional joint fine-tune.

Covers the reference FinalTrainer / FinalPokemonGenerator
(src/training/final_trainer.py):

- loads frozen VAE (stage 1) and UNet (stage 2) checkpoints; text encoder
  starts from the stage-1 weights (final_trainer.py:90-163);
- training loss is an encode->decode roundtrip (VAE encoder under
  stop_gradient, :215-236): L1 + 0.1*MSE (:425-440) +
  clip_weight * CLIP alignment loss (:469-473) — diffusion is NOT in the
  training loss path;
- two phases: text-encoder-only, then ``switch_to_joint_training`` at
  ``phase1_epochs`` (default final_epochs // 2) unfreezes decoder + UNet
  and rebuilds the optimizer with 3 param groups (text lr; decoder/unet
  lr = 0.1 x text lr; :590-642,699-700);
- sampling exercises the full DDPM chain with the posterior-variance
  sampler over uniformly-strided timesteps (:165-213).

Phase switching under jit: both phase optimizers are built up front as
label trees; the switch swaps the transform + re-inits optimizer state
(the reference also rebuilds its optimizer at the switch).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from psg_tpu.core.checkpoint import CheckpointManager, load_metadata, load_state
from psg_tpu.core.config import Config
from psg_tpu.core.metrics import MetricsWriter, setup_logging
from psg_tpu.core.stability import global_norm
from psg_tpu.data import make_loaders
from psg_tpu.diffusion import (ddim_sample, ddpm_sample, dpmpp_2m_sample,
                               make_schedule)
from psg_tpu.models.clip import ClipConfig, clip_alignment_loss, clip_init
from psg_tpu.models.losses import l1_loss, mse_loss
from psg_tpu.models.text_encoder import text_encoder_apply, text_encoder_init
from psg_tpu.models.unet import text_bias_from_mask, unet_apply, unet_init
from psg_tpu.models.vae import (
    latent_size_for,
    reparameterize,
    vae_decode,
    vae_encoder_apply,
    vae_init,
)
from psg_tpu.train.optim import build_optimizer, make_lr_schedule
from psg_tpu.train.stage1_vae import bert_config_for, get_tokenizer
from psg_tpu.train.stage2_diffusion import unet_spec_from_config
from psg_tpu.train.state import TrainState
from psg_tpu.utils.images import save_image_grid


class FinalTrainer:
    STAGE = "final"

    def __init__(self, cfg: Config, vae_checkpoint_path, diffusion_checkpoint_path,
                 experiment_name: str = "pokemon", mesh=None):
        self.cfg = cfg
        self.mesh = mesh
        self.stage_dir = Path(cfg.experiment_dir) / f"{experiment_name}_final"
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
        self.spec = unet_spec_from_config(cfg, self.latent_size)
        m = cfg.model
        self.schedule = make_schedule(m.num_timesteps, m.beta_start, m.beta_end,
                                      m.beta_schedule)

        params = self._load_params(vae_checkpoint_path, diffusion_checkpoint_path)

        # frozen CLIP: with converted OpenAI weights AND the matching BPE
        # artifacts, the loss runs the real ViT-B/32 on BPE token ids
        # (clip_loss.py:22-23,55 semantics); otherwise a fixed-random tower
        # on the framework's WordPiece ids keeps the objective live offline
        from psg_tpu.text import ClipBPETokenizer

        self.clip_bpe = ClipBPETokenizer.find()
        if self.clip_bpe is not None and self._clip_ckpt_path() is not None:
            self.clip_cfg = ClipConfig.b32()._replace(
                text_vocab=self.clip_bpe.vocab_size)
            self.ds.set_clip_tokenizer(self.clip_bpe)
        else:
            self.clip_bpe = None
            self.clip_cfg = (ClipConfig.tiny_test(self.tokenizer.vocab_size)
                             if "tiny-test" in cfg.model.bert_model
                             else ClipConfig.b32()._replace(
                                 text_vocab=self.tokenizer.vocab_size))
        self.clip_params, clip_pretrained = self._load_clip()
        self.log.info("weights: clip=%s (text ids: %s)",
                      "pretrained" if clip_pretrained else "random-init",
                      "CLIP-BPE" if self.clip_bpe else "WordPiece")
        self._batch_keys = ("image", "text_ids", "text_mask") + (
            ("clip_ids", "clip_mask") if self.clip_bpe else ())

        # optimizers for both phases
        o = cfg.optimization
        epochs = cfg.training.final_epochs
        spe = max(len(self.train_loader), 1)
        text_lr = o.text_encoder_lr or o.learning_rate * 0.1
        sched_kind = o.scheduler if o.scheduler in ("cosine", "step") else "constant"

        def sched(lr):
            return make_lr_schedule(sched_kind, lr, total_steps=epochs * spe,
                                    steps_per_epoch=spe,
                                    warmup_steps=cfg.optimization.warmup_steps,
                                    end_factor=cfg.optimization.lr_end_factor)

        dec_lr = (cfg.extra or {}).get("optimization", {}).get(
            "vae_decoder_lr", text_lr * 0.1)
        unet_lr = (cfg.extra or {}).get("optimization", {}).get(
            "unet_lr", text_lr * 0.1)

        def label_all(tree, name):
            return jax.tree_util.tree_map(lambda _: name, tree)

        labels_p1 = {
            "text": label_all(params["text"], "text"),
            "vae": label_all(params["vae"], "frozen"),
            "unet": label_all(params["unet"], "frozen"),
        }
        labels_p2 = {
            "text": label_all(params["text"], "text"),
            "vae": {
                "encoder": label_all(params["vae"]["encoder"], "frozen"),
                "decoder": label_all(params["vae"]["decoder"], "decoder"),
            },
            "unet": label_all(params["unet"], "unet"),
        }
        groups_p1 = {"text": {"lr_schedule": sched(text_lr),
                              "max_grad_norm": o.max_grad_norm}}
        groups_p2 = {
            "text": {"lr_schedule": sched(text_lr), "max_grad_norm": o.max_grad_norm},
            "decoder": {"lr_schedule": sched(dec_lr), "max_grad_norm": o.max_grad_norm},
            "unet": {"lr_schedule": sched(unet_lr), "max_grad_norm": o.max_grad_norm},
        }
        self.tx_phase1 = build_optimizer(o, groups_p1, labels_p1)
        self.tx_phase2 = build_optimizer(o, groups_p2, labels_p2)

        self.phase = "text_encoder"
        self.tx = self.tx_phase1
        key = jax.random.PRNGKey(cfg.seed + 2)
        self.state = TrainState.create(params, self.tx.init(params), key)
        if mesh is not None:
            # DP over 'data'; with model>1 the wide UNet/VAE kernels (and
            # Adam moments) shard their channel axis over 'model'
            from psg_tpu.parallel import replicated, shard_state, unet_tp_rules

            self._tp_rule = None
            if mesh.shape.get("model", 1) > 1:
                self._tp_rule = unet_tp_rules(int((cfg.extra or {}).get(
                    "tp_min_channels", 640)))
            self.state = shard_state(self.state, mesh, self._tp_rule)
            self.clip_params = jax.device_put(self.clip_params, replicated(mesh))
        self.start_epoch = 0
        self.best_val = float("inf")

        self._jit_steps()

    def _jit_steps(self):
        self._train_step = jax.jit(self._step, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval)
        self._sample_fn = jax.jit(self._sample,
                                  static_argnames=("num", "steps", "sampler"))

    # -- setup -----------------------------------------------------------------

    def _load_params(self, vae_path, diff_path) -> Dict:
        from psg_tpu.core.initutil import jit_init

        key = jax.random.PRNGKey(self.cfg.seed)
        k_vae, k_text, k_unet, _ = jax.random.split(key, 4)
        vae_tmpl = {
            "vae": jit_init(vae_init, k_vae, self.cfg.model.latent_dim,
                            self.cfg.model.text_embedding_dim,
                            width_scale=self.cfg.model.vae_width_scale),
            "text": jit_init(text_encoder_init, k_text, self.bert_cfg,
                             self.cfg.model.text_embedding_dim),
        }
        unet_tmpl = jit_init(unet_init, k_unet, self.spec)

        from psg_tpu.core.checkpoint import load_params, load_sample_params

        if vae_path and Path(vae_path).exists():
            vae_tmpl = load_params(vae_path, vae_tmpl)
            self.log.info("loaded VAE+text from %s", vae_path)
        else:
            self.log.warning("no VAE checkpoint (%r) — random init", str(vae_path))
        if diff_path and Path(diff_path).exists():
            # the frozen UNet drives generation only — prefer EMA weights
            unet_tmpl = load_sample_params(diff_path, unet_tmpl)
            self.log.info("loaded UNet from %s", diff_path)
        else:
            self.log.warning("no diffusion checkpoint (%r) — random init",
                             str(diff_path))
        return {"vae": vae_tmpl["vae"], "text": vae_tmpl["text"], "unet": unet_tmpl}

    @staticmethod
    def _clip_ckpt_path():
        import os

        p = Path(os.environ.get("PSG_TPU_CLIP", "weights/clip_vit_b32.ckpt"))
        return p if p.exists() else None

    def _load_clip(self):
        from psg_tpu.core.initutil import jit_init

        path = self._clip_ckpt_path()
        if path is not None:
            return load_state(
                path, jit_init(clip_init, jax.random.PRNGKey(0), self.clip_cfg)), True
        return jit_init(clip_init, jax.random.PRNGKey(4321), self.clip_cfg), False

    # -- jitted fns --------------------------------------------------------------

    def _roundtrip(self, params, batch, rng):
        """encode (stop-grad) -> decode with trainable text conditioning
        (final_trainer.py:215-236)."""
        text_emb = text_encoder_apply(params["text"], batch["text_ids"],
                                      batch["text_mask"], self.bert_cfg,
                                      dtype=self.compute_dtype)
        mu, logvar = vae_encoder_apply(params["vae"]["encoder"], batch["image"],
                                       dtype=self.compute_dtype)
        latent = reparameterize(rng, mu, logvar)
        latent = jax.lax.stop_gradient(latent)
        recon = vae_decode(params["vae"], latent.astype(text_emb.dtype), text_emb,
                           text_bias=text_bias_from_mask(batch["text_mask"]),
                           image_size=self.cfg.data.image_size,
                           dtype=self.compute_dtype)
        return recon

    def _loss(self, params, clip_params, batch, rng, sample_weights=None):
        recon = self._roundtrip(params, batch, rng)
        l1 = l1_loss(recon, batch["image"], sample_weights=sample_weights)
        mse = mse_loss(recon, batch["image"], sample_weights=sample_weights)
        gen_loss = l1 + 0.1 * mse  # (:425-440)
        # BPE ids for a pretrained CLIP tower; WordPiece ids otherwise
        clip = clip_alignment_loss(clip_params, recon,
                                   batch.get("clip_ids", batch["text_ids"]),
                                   batch.get("clip_mask", batch["text_mask"]),
                                   self.clip_cfg, dtype=self.compute_dtype,
                                   sample_weights=sample_weights)
        total = gen_loss + self.cfg.training.clip_weight * clip
        return total, {"total_loss": total, "l1_loss": l1, "mse_loss": mse,
                       "clip_loss": clip}

    def _step(self, state: TrainState, clip_params, batch):
        # clip_params are a jit ARGUMENT — closing over the frozen CLIP
        # tower bakes ~0.5GB of constants into the program (HTTP 413 from
        # the remote compiler)
        rng = jax.random.fold_in(state.rng, state.step)

        def loss_fn(p):
            return self._loss(p, clip_params, batch, rng)

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        parts = dict(parts)
        parts["grad_norm"] = global_norm(grads)
        return TrainState(state.step + 1, params, opt_state, state.rng), parts

    def _eval(self, state: TrainState, clip_params, batch, valid):
        # mask wraparound-padded tail samples so val loss is exact
        rng = jax.random.fold_in(state.rng, jnp.int32(-3))
        w = (jnp.arange(batch["image"].shape[0]) < valid).astype(jnp.float32)
        _, parts = self._loss(state.params, clip_params, batch, rng,
                              sample_weights=w)
        return parts

    def _sample(self, params, rng, text_ids, text_mask, *, num: int,
                steps: int = 50, sampler: str = "ddim"):
        """Full text->sprite chain.  Default DDIM (correct striding — the
        eps-form posterior sampler repeats single-step updates at visited
        timesteps and stays near the prior, tests/test_diffusion.py);
        ``sampler='ddpm'`` restores exact FinalPokemonGenerator.forward
        parity (final_trainer.py:165-213)."""
        text_emb = text_encoder_apply(params["text"], text_ids, text_mask,
                                      self.bert_cfg, dtype=self.compute_dtype)

        def denoise(x, t):
            out = unet_apply(params["unet"], x.astype(text_emb.dtype), t,
                             text_emb, self.spec, text_mask=text_mask,
                             dtype=self.compute_dtype)
            if (self.cfg.extra or {}).get("prediction_type", "eps") == "v":
                # a v-trained stage-2 base: convert to the eps the
                # samplers consume (schedule.eps_from_v docstring)
                out = self.schedule.eps_from_v(out, x, t)
            return out

        shape = (num, self.latent_size, self.latent_size, self.cfg.model.latent_dim)
        if sampler == "ddpm":
            # strided eps-form posterior sampler — exactly
            # FinalPokemonGenerator.forward (final_trainer.py:186-204)
            latents = ddpm_sample(denoise, self.schedule, rng, shape=shape,
                                  num_inference_steps=steps)
        elif sampler == "dpmpp":
            latents = dpmpp_2m_sample(denoise, self.schedule, rng, shape=shape,
                                      num_inference_steps=steps,
                                      clip_x0=self.cfg.model.latent_clamp)
        else:
            latents = ddim_sample(denoise, self.schedule, rng, shape=shape,
                                  num_inference_steps=steps,
                                  clip_x0=self.cfg.model.latent_clamp)
        return vae_decode(params["vae"], latents.astype(text_emb.dtype), text_emb,
                          text_bias=text_bias_from_mask(text_mask),
                          image_size=self.cfg.data.image_size,
                          dtype=self.compute_dtype)

    # -- device-resident fast path (train/fastpath.py) -----------------------

    def _fast_epoch_impl(self, state: TrainState, clip_params, data):
        # NOTE: imports deliberately NOT done here — a lazy import inside a
        # jitted function runs at trace time, and any module-level array the
        # imported module builds becomes a tracer that leaks into later
        # traces (this crashed the round-4 stage-3 joint phase at its
        # re-jit).  All imports happen in _setup_fast_data instead.
        augment_batch = self._augment_batch
        normalize_batch = self._normalize_batch
        draw_minibatch = self._draw_minibatch

        n = data["images"].shape[0]
        bs = self.cfg.data.batch_size

        def body(st, _):
            rng = jax.random.fold_in(st.rng, st.step)
            k_idx, k_aug, k_loss = jax.random.split(rng, 3)
            idx = draw_minibatch(k_idx, n, bs)
            imgs_u8 = data["images"][idx]
            if self.cfg.data.augment:
                imgs = augment_batch(imgs_u8, k_aug, self.ds.background)
            else:
                imgs = normalize_batch(imgs_u8)
            batch = {"image": imgs, "text_ids": data["text_ids"][idx],
                     "text_mask": data["text_mask"][idx]}
            if "clip_ids" in data:
                batch["clip_ids"] = data["clip_ids"][idx]
                batch["clip_mask"] = data["clip_mask"][idx]

            def loss_fn(p):
                return self._loss(p, clip_params, batch, k_loss)

            (_, parts), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(st.params)
            updates, opt_state = self.tx.update(grads, st.opt_state, st.params)
            params = optax.apply_updates(st.params, updates)
            ys = dict(parts)
            ys["grad_norm"] = global_norm(grads)
            return TrainState(st.step + 1, params, opt_state, st.rng,
                              st.ema), ys

        return jax.lax.scan(body, state, None, length=self._fast_len)

    def _fast_val_impl(self, state: TrainState, clip_params, ev):
        normalize_batch = self._normalize_batch

        def body(carry, inp):
            i, batch = inp
            rng = jax.random.fold_in(jax.random.fold_in(state.rng,
                                                        jnp.int32(-3)), i)
            b = {"image": normalize_batch(batch["images"]),
                 "text_ids": batch["text_ids"], "text_mask": batch["text_mask"]}
            if "clip_ids" in batch:
                b["clip_ids"] = batch["clip_ids"]
                b["clip_mask"] = batch["clip_mask"]
            _, parts = self._loss(state.params, clip_params, b, rng,
                                  sample_weights=batch["weight"])
            w = jnp.sum(batch["weight"])
            return (carry[0] + parts["total_loss"] * w, carry[1] + w), None

        nb = ev["images"].shape[0]
        (tot, cnt), _ = jax.lax.scan(
            body, (jnp.float32(0.0), jnp.float32(0.0)),
            (jnp.arange(nb), ev))
        return tot / jnp.maximum(cnt, 1.0)

    def _setup_fast_data(self):
        from psg_tpu.data.device_augment import augment_batch, normalize_batch
        from psg_tpu.train.fastpath import (device_split, draw_minibatch,
                                            eval_batches)

        self._augment_batch = augment_batch
        self._normalize_batch = normalize_batch
        self._draw_minibatch = draw_minibatch
        self._train_data = device_split(self.ds, self.train_loader.indices)
        self._val_data = eval_batches(self.ds, self.val_loader.indices,
                                      self.cfg.data.batch_size)
        self._fast_len = max(len(self.train_loader), 1)
        self._jit_fast()

    def _jit_fast(self):
        self._fast_epoch = jax.jit(self._fast_epoch_impl, donate_argnums=(0,))
        self._fast_val = jax.jit(self._fast_val_impl)

    def train_epoch_fast(self, epoch: int) -> Dict[str, float]:
        self.state, ys = self._fast_epoch(self.state, self.clip_params,
                                          self._train_data)
        stats = {k: float(np.asarray(v, np.float32).mean())
                 for k, v in ys.items()}
        self.metrics.scalars(stats, int(self.state.step), prefix="final_train/")
        return stats

    def validate_fast(self, epoch: int) -> float:
        val = float(self._fast_val(self.state, self.clip_params,
                                   self._val_data))
        self.metrics.scalar("final_val/total_loss", val, int(self.state.step))
        return val

    def save_checkpoint_fast(self, epoch: int, val_loss) -> bool:
        """Light bf16 best + periodic full states — see
        DiffusionTrainer.save_checkpoint_fast."""
        tr = self.cfg.training
        meta = {"epoch": epoch, "phase": self.phase,
                "config": self.cfg.to_dict()}
        is_best = False
        allow_best = val_loss is not None and (
            (epoch + 1) % max(tr.best_every, 1) == 0
            or epoch + 1 == tr.final_epochs)
        if allow_best:
            is_best = self.ckpt.save_best_light(
                self.state.sample_params, int(self.state.step), val_loss,
                extra_meta=meta)
        if (epoch + 1) % tr.save_every == 0:
            self.ckpt.save(self.state, int(self.state.step), None,
                           extra_meta=meta, periodic=True)
        return is_best

    def _train_fast(self) -> Path:
        tr = self.cfg.training
        epochs = tr.final_epochs
        phase1 = tr.phase1_epochs if tr.phase1_epochs is not None else \
            epochs // 2
        self._setup_fast_data()
        self.log.info("stage 3 (fast path): %d epochs x %d scanned steps "
                      "(joint from epoch %d), batch %d", epochs,
                      self._fast_len, phase1, self.cfg.data.batch_size)
        for epoch in range(self.start_epoch, epochs):
            if epoch >= phase1 and self.phase == "text_encoder":
                self.switch_to_joint_training()
            t0 = time.time()
            stats = self.train_epoch_fast(epoch)
            val_loss = None
            if (epoch + 1) % max(tr.val_every, 1) == 0:
                val_loss = self.validate_fast(epoch)
                if val_loss < self.best_val:
                    self.best_val = val_loss
            self.save_checkpoint_fast(epoch, val_loss)
            if (epoch + 1) % tr.sample_every == 0:
                self.generate_samples(epoch)
            dt = time.time() - t0
            self.log.info(
                "epoch %d (%s) done in %.1fs (%.1f steps/s): train %.4f "
                "clip %.4f val %s", epoch, self.phase, dt,
                self._fast_len / max(dt, 1e-9), stats["total_loss"],
                stats["clip_loss"],
                f"{val_loss:.4f}" if val_loss is not None else "-")
        if epochs > self.start_epoch:
            self.ckpt.save(self.state, int(self.state.step), None,
                           extra_meta={"epoch": epochs - 1,
                                       "phase": self.phase,
                                       "config": self.cfg.to_dict()},
                           periodic=True)
        self.metrics.flush()
        return self.ckpt.best_path

    # -- phase switch ---------------------------------------------------------

    def switch_to_joint_training(self):
        """Unfreeze decoder + UNet, fresh 3-group optimizer (:590-642)."""
        self.log.info("switching to joint training (unfreeze decoder + unet)")
        self.phase = "joint"
        self.tx = self.tx_phase2
        self.state = TrainState(self.state.step, self.state.params,
                                self.tx.init(self.state.params), self.state.rng,
                                self.state.ema)
        self._jit_steps()
        if hasattr(self, "_fast_epoch"):
            self._jit_fast()  # tx changed; the scanned body must re-trace

    # -- loops ------------------------------------------------------------------

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        sums: Dict[str, float] = {}
        count = 0
        for batch in self.train_loader:
            b = {k: batch[k] for k in self._batch_keys if k in batch}
            if self.mesh is not None:
                from psg_tpu.parallel import shard_batch

                b = shard_batch(b, self.mesh)
            self.state, parts = self._train_step(self.state, self.clip_params, b)
            count += 1
            if count % self.cfg.training.log_every == 0:
                vals = {k: float(v) for k, v in parts.items()}
                self.metrics.scalars(vals, int(self.state.step),
                                     prefix="final_train/")
                self.log.info("epoch %d step %d loss %.4f clip %.4f",
                              epoch, int(self.state.step), vals["total_loss"],
                              vals["clip_loss"])
            for k, v in parts.items():
                # accumulate device arrays — float() here would force a
                # host sync every step
                sums[k] = sums.get(k, 0.0) + v
        return {k: float(v) / max(count, 1) for k, v in sums.items()}

    def validate(self, epoch: int) -> float:
        total, n = 0.0, 0
        for batch in self.val_loader:
            valid = int(batch["valid"])
            b = {k: batch[k] for k in self._batch_keys if k in batch}
            if self.mesh is not None:
                from psg_tpu.parallel import shard_batch

                b = shard_batch(b, self.mesh)
            parts = self._eval_step(self.state, self.clip_params, b,
                                    jnp.int32(valid))
            total += float(parts["total_loss"]) * valid
            n += valid
        val = total / max(n, 1)
        self.metrics.scalar("final_val/total_loss", val, int(self.state.step))
        return val

    def generate_samples(self, epoch: int, num: int = 4, steps: int = None):
        descs = self.ds.full_descriptions[:num]
        ids, mask = self.tokenizer.encode_batch(descs, self.cfg.data.text_len)
        rng = jax.random.fold_in(self.state.rng, 30_000 + epoch)
        extra = self.cfg.extra or {}
        if steps is None:
            steps = int(extra.get("sample_steps", 100))
        imgs = self._sample_fn(self.state.params, rng, jnp.asarray(ids),
                               jnp.asarray(mask), num=num, steps=steps,
                               sampler=str(extra.get("sample_sampler", "ddim")))
        save_image_grid(np.asarray(imgs),
                        self.stage_dir / "samples" / f"final_epoch_{epoch:04d}.png",
                        captions=descs)

    def save_checkpoint(self, epoch: int, val_loss: float) -> bool:
        tr = self.cfg.training
        allow_best = ((epoch + 1) % max(tr.best_every, 1) == 0
                      or epoch + 1 == tr.final_epochs)
        return self.ckpt.save(
            self.state, int(self.state.step),
            val_loss if allow_best else None,
            extra_meta={"epoch": epoch, "training_phase": self.phase,
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
        if meta.get("training_phase") == "joint" and self.phase != "joint":
            self.switch_to_joint_training()

    def train(self) -> Path:
        if self.cfg.training.fast_path and self.mesh is None:
            return self._train_fast()
        t = self.cfg.training
        epochs = t.final_epochs
        phase1 = t.phase1_epochs if t.phase1_epochs is not None else epochs // 2
        self.log.info("stage 3: %d epochs (phase1 %d), %d batches/epoch",
                      epochs, phase1, len(self.train_loader))
        for epoch in range(self.start_epoch, epochs):
            if epoch == phase1 and self.phase == "text_encoder":
                self.switch_to_joint_training()
            t0 = time.time()
            self.train_loader.set_epoch(epoch)
            stats = self.train_epoch(epoch)
            val_loss = self.validate(epoch)
            if val_loss < self.best_val:
                self.best_val = val_loss
            self.save_checkpoint(epoch, val_loss)
            if (epoch + 1) % t.sample_every == 0:
                self.generate_samples(epoch)
            self.log.info("epoch %d (%s) done in %.1fs: train %.4f val %.4f",
                          epoch, self.phase, time.time() - t0,
                          stats.get("total_loss", 0.0), val_loss)
        self.metrics.flush()
        return self.ckpt.best_path
