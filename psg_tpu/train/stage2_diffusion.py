"""Stage 2: UNet diffusion training on frozen VAE latents.

Covers the reference's default stage-2 trainer, ImprovedDiffusionTrainer
(src/training/improved_diffusion_trainer.py), plus the legacy
DiffusionTrainer's options behind config knobs:

- frozen VAE encoder/decoder + text encoder loaded from the stage-1
  checkpoint (improved_diffusion_trainer.py:177-208);
- cosine beta schedule (default) or linear (legacy trainer / gradio);
- latents clamped to +-3 (improved_diffusion_trainer.py:363);
- SmoothL1(beta=0.1) loss (default; 'mse' = legacy, :300 / :257);
- AdamW(eps 1e-6) with the unet_optimization > optimization > training
  config cascade (:256-300);
- scheduler 'cosine' means OneCycleLR over total steps with 10% warmup,
  stepped per batch (:302-319,413) — 'constant' (the shipped config) stays
  constant;
- NaN-robust updates via optax.apply_if_finite + skipped-batch counter
  (replaces :328-333,376-393 host machinery);
- periodic sample grids via the strided fast DDPM sampler (:508-569)
  decoded by the frozen VAE.

The train step is one jitted function: frozen text encode + VAE encode,
q_sample, UNet forward/backward, masked optimizer update — no host syncs.
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
from psg_tpu.core.metrics import MetricsWriter, Throughput, setup_logging
from psg_tpu.core.stability import global_norm
from psg_tpu.data import make_loaders
from psg_tpu.diffusion import (ddim_sample, ddpm_sample_fast, dpmpp_2m_sample,
                               make_schedule)
from psg_tpu.models.losses import mse_loss, smooth_l1_loss
from psg_tpu.models.text_encoder import text_encoder_apply, text_encoder_init
from psg_tpu.models.unet import UNetSpec, text_bias_from_mask, unet_apply, unet_init
from psg_tpu.models.vae import (
    latent_size_for,
    vae_decode,
    vae_encoder_apply,
    vae_init,
    reparameterize,
)
from psg_tpu.train.optim import build_optimizer, make_lr_schedule
from psg_tpu.train.stage1_vae import bert_config_for, get_tokenizer
from psg_tpu.train.state import TrainState
from psg_tpu.utils.images import save_image_grid


def unet_spatial_for(latent_size: int, levels: int = 4):
    """Per-level spatial sizes under stride-2 k3 p1 downsamples
    (torch floor semantics): 27 -> 14 -> 7 -> 4."""
    sizes = [latent_size]
    for _ in range(levels - 1):
        sizes.append((sizes[-1] + 1) // 2)
    return tuple(sizes)


def unet_spec_from_config(cfg: Config, latent_size: Optional[int] = None) -> UNetSpec:
    m = cfg.model
    ls = latent_size if latent_size is not None else latent_size_for(cfg.data.image_size)
    return UNetSpec(
        latent_dim=m.latent_dim,
        text_dim=m.text_embedding_dim,
        time_emb_dim=m.time_emb_dim,
        num_heads=m.num_attention_heads,
        channels=tuple(m.unet_channels),
        spatial=unet_spatial_for(ls, len(m.unet_channels)),
        self_attn_scale=m.self_attn_scale,
        cross_attn_scale=m.cross_attn_scale,
        ffn_scale=m.ffn_scale,
        attn_dropout=m.attn_dropout,
    )


class DiffusionTrainer:
    """Stage-2 trainer (the reference aliases ImprovedDiffusionTrainer to
    DiffusionTrainer, src/training/__init__.py:7)."""

    STAGE = "diffusion"

    def __init__(self, cfg: Config, vae_checkpoint_path,
                 experiment_name: str = "pokemon", mesh=None):
        self.cfg = cfg
        self.mesh = mesh
        self.stage_dir = Path(cfg.experiment_dir) / f"{experiment_name}_diffusion"
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

        # frozen stage-1 components (improved_diffusion_trainer.py:177-208)
        self.frozen = self._load_frozen(vae_checkpoint_path)
        # recorded in every sidecar so serving/bench resolve the UNet with
        # the exact VAE that defines its latent space (ADVICE r3)
        self.vae_ckpt_path = (str(vae_checkpoint_path)
                              if vae_checkpoint_path else None)

        # diffusion schedule (cosine default, :41-48)
        m = cfg.model
        self.schedule = make_schedule(m.num_timesteps, m.beta_start, m.beta_end,
                                      m.beta_schedule)

        # UNet + optimizer with the unet_optimization override cascade
        from psg_tpu.core.initutil import jit_init

        key = jax.random.PRNGKey(cfg.seed + 1)
        k_unet, k_state = jax.random.split(key)
        unet_params = jit_init(unet_init, k_unet, self.spec)

        uo = cfg.extra.get("unet_optimization", {}) if cfg.extra else {}
        o = cfg.optimization
        lr = uo.get("learning_rate", o.learning_rate)
        sched_kind = uo.get("scheduler", o.scheduler)
        spe = max(len(self.train_loader), 1)
        total_steps = cfg.training.diffusion_epochs * spe
        # stage-2 'cosine' == OneCycle with 10% warmup (:302-319);
        # 'legacy_cosine' == plain cosine anneal (diffusion_trainer.py:242-246)
        if sched_kind == "cosine":
            kind = "onecycle"
        elif sched_kind == "legacy_cosine":
            kind = "cosine"
        else:
            kind = sched_kind
        lr_sched = make_lr_schedule(kind, lr, total_steps=total_steps,
                                    steps_per_epoch=spe,
                                    pct_start=o.onecycle_pct_start,
                                    warmup_steps=uo.get("warmup_steps",
                                                        o.warmup_steps),
                                    end_factor=o.lr_end_factor)
        import dataclasses

        # AdamW eps=1e-6 for stability (improved_diffusion_trainer.py:283,291)
        opt_cfg = dataclasses.replace(
            o, eps=1e-6, weight_decay=uo.get("weight_decay", o.weight_decay))
        labels = jax.tree_util.tree_map(lambda _: "unet", unet_params)
        self.tx = build_optimizer(
            opt_cfg,
            {"unet": {"lr_schedule": lr_sched,
                      "max_grad_norm": uo.get("max_grad_norm", o.max_grad_norm)}},
            labels,
        )
        # EMA of UNet params for sampling (r3 stability plan): tracked in
        # the train state, updated on-device each step, used by sample
        # grids and preferred by serving
        self.ema_decay = float(cfg.optimization.ema_decay)
        ema = (jax.tree_util.tree_map(jnp.array, unet_params)
               if self.ema_decay > 0 else ())
        self.state = TrainState.create(unet_params, self.tx.init(unet_params),
                                       k_state, ema=ema)
        if mesh is not None:
            # DP: batches sharded over 'data' (shard_batch below); XLA
            # psums the grads over ICI.  TP: with mesh model>1 the wide
            # UNet kernels (and their Adam moments) shard their channel
            # axis over 'model' — the optional first-class model axis of
            # SURVEY §2.6; frozen towers stay replicated.
            from psg_tpu.parallel import replicated, shard_state, unet_tp_rules

            rule = None
            if mesh.shape.get("model", 1) > 1:
                rule = unet_tp_rules(int((cfg.extra or {}).get(
                    "tp_min_channels", 640)))
            self.state = shard_state(self.state, mesh, rule)
            self.frozen = jax.device_put(self.frozen, replicated(mesh))
        self.start_epoch = 0
        self.best_val = float("inf")
        extra = cfg.extra or {}
        self.loss_kind = extra.get("diffusion_loss", "smooth_l1")
        # extra.prediction_type: 'eps' (reference semantics, default) or
        # 'v' (Salimans & Ho 2022) — v-training re-balances the implicit
        # SNR weighting so the low-SNR steps where global structure forms
        # carry real gradient (VERDICT r4 #3's anatomy lever).  Samplers
        # always consume eps; v outputs are converted via
        # schedule.eps_from_v at every sampling site, keyed off the
        # sidecar config in serving/eval.
        self.pred_type = str(extra.get("prediction_type", "eps"))
        if self.pred_type not in ("eps", "v"):
            raise ValueError(f"unknown extra.prediction_type "
                             f"{self.pred_type!r} (want 'eps' or 'v')")
        # extra.snr_gamma: min-SNR-gamma loss weighting (Hang et al. 2023),
        # w_t = min(SNR_t, gamma)/SNR_t for eps-prediction.  The eps loss
        # implicitly scales the x0 error by SNR_t, drowning the low-SNR
        # (high-t) steps where global structure forms — exactly the regime
        # the round-3 x0 diagnostic showed failing.  0/None disables.
        self.snr_gamma = float(extra.get("snr_gamma", 0.0) or 0.0)
        # extra.cond_dropout: per-sample probability of replacing the text
        # conditioning with the zero embedding during training — trains the
        # unconditional branch classifier-free guidance samples against.
        self.cond_dropout = float(extra.get("cond_dropout", 0.0) or 0.0)
        # extra.caption_augment: K tokenized text-level caption variants
        # per sample (data/caption_augment.py — name drop, sentence
        # shuffle/dropout), drawn uniformly per sample per step — on
        # device in the fast path, in the host loader on the classic/mesh
        # path (data/loader.py::_make_batch).
        # Offline substitute for what pretrained BERT buys the reference
        # (src/models/text_encoder.py:30-40): wording generalization.
        # 0/None disables (text embeddings then precomputed once).
        self.caption_augment = int(extra.get("caption_augment", 0) or 0)
        if self.caption_augment > 0:
            # extra.caption_name_drop: probability an augmented variant
            # loses its "Pokemon named X." prefix.  Round 4 measured the
            # 0.5 default collapsing name conditioning; 0 keeps names.
            self.ds.set_caption_variants(
                self.caption_augment,
                int(extra.get("caption_aug_seed", cfg.seed)),
                p_name_drop=float(extra.get("caption_name_drop", 0.5)))

        self._train_step = jax.jit(self._step, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval)
        self._sample_fn = jax.jit(self._sample, static_argnames=(
            "num", "stride", "sampler", "steps", "guidance"))

    # -- setup ---------------------------------------------------------------

    def _load_frozen(self, vae_checkpoint_path) -> Dict:
        """Load {'vae','text'} params from a stage-1 checkpoint; random init
        fallback when absent (parallels diffusers_trainer.py:258-269)."""
        from psg_tpu.core.initutil import jit_init

        key = jax.random.PRNGKey(self.cfg.seed)
        k_vae, k_text, _, _ = jax.random.split(key, 4)
        template = {
            "vae": jit_init(vae_init, k_vae, self.cfg.model.latent_dim,
                            self.cfg.model.text_embedding_dim,
                            width_scale=self.cfg.model.vae_width_scale),
            "text": jit_init(text_encoder_init, k_text, self.bert_cfg,
                             self.cfg.model.text_embedding_dim),
        }
        if vae_checkpoint_path and Path(vae_checkpoint_path).exists():
            from psg_tpu.core.checkpoint import load_params

            # structure-free restore of just the params subtree
            # (multi-format tolerance like improved_diffusion_trainer.py:181-191)
            params = load_params(vae_checkpoint_path, template)
            self.log.info("loaded frozen VAE/text from %s", vae_checkpoint_path)
            return jax.device_put(params)
        self.log.warning("no VAE checkpoint at %r — using random frozen weights",
                         str(vae_checkpoint_path))
        return jax.device_put(template)

    # -- jitted fns -----------------------------------------------------------

    def _noise_loss_emb(self, unet_params, frozen_vae, images, text_emb,
                        text_mask, rng, dropout_key=None, sample_weights=None,
                        train: bool = True):
        """Diffusion loss from images + precomputed text embeddings (the
        text encoder is frozen in stage 2, so the fast path computes all
        embeddings once up front)."""
        k_rep, k_t, k_noise, k_cond = jax.random.split(rng, 4)
        mu, logvar = vae_encoder_apply(frozen_vae["encoder"], images,
                                       dtype=self.compute_dtype)
        latent = reparameterize(k_rep, mu, logvar)
        clamp = self.cfg.model.latent_clamp
        latent = jnp.clip(latent, -clamp, clamp)  # (:363)
        b = latent.shape[0]
        t = jax.random.randint(k_t, (b,), 0, self.schedule.num_timesteps)
        noise = jax.random.normal(k_noise, latent.shape, jnp.float32)
        noisy = self.schedule.add_noise(latent, noise, t)
        if train and self.cond_dropout > 0.0:
            keep = (jax.random.uniform(k_cond, (b,) + (1,) * (text_emb.ndim - 1))
                    >= self.cond_dropout).astype(text_emb.dtype)
            text_emb = text_emb * keep
        pred = unet_apply(unet_params, noisy.astype(latent.dtype), t, text_emb,
                          self.spec, text_mask=text_mask,
                          dtype=self.compute_dtype, dropout_key=dropout_key)
        target = (noise if self.pred_type == "eps"
                  else self.schedule.velocity(latent, noise, t))
        if train and self.snr_gamma > 0.0:
            acp = self.schedule.alphas_cumprod[t]
            snr = acp / jnp.maximum(1.0 - acp, 1e-8)
            if self.pred_type == "v":
                # min-SNR for v-loss: the v objective already carries an
                # (SNR+1) factor relative to the x0 error, so the Hang et
                # al. weight becomes min(SNR, gamma)/(SNR + 1)
                w = jnp.minimum(snr, self.snr_gamma) / (snr + 1.0)
            else:
                w = jnp.minimum(snr, self.snr_gamma) / jnp.maximum(snr, 1e-8)
            sample_weights = w if sample_weights is None else w * sample_weights
        if self.loss_kind == "mse":
            return mse_loss(pred, target, sample_weights=sample_weights)
        return smooth_l1_loss(pred, target, beta=0.1,
                              sample_weights=sample_weights)

    def _noise_loss(self, unet_params, frozen, batch, rng, dropout_key=None,
                    sample_weights=None, train: bool = True):
        text_emb = text_encoder_apply(frozen["text"], batch["text_ids"],
                                      batch["text_mask"], self.bert_cfg,
                                      dtype=self.compute_dtype)
        return self._noise_loss_emb(unet_params, frozen["vae"], batch["image"],
                                    text_emb, batch["text_mask"], rng,
                                    dropout_key=dropout_key,
                                    sample_weights=sample_weights, train=train)

    def _apply_update(self, state: TrainState, loss, grads):
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if self.ema_decay > 0:
            d = self.ema_decay
            ema = jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p.astype(e.dtype),
                state.ema, params)
        else:
            ema = state.ema
        metrics = {"loss": loss, "grad_norm": global_norm(grads)}
        return TrainState(state.step + 1, params, opt_state, state.rng,
                          ema), metrics

    def _step(self, state: TrainState, frozen, batch):
        rng = jax.random.fold_in(state.rng, state.step)
        k_loss, k_drop = jax.random.split(rng)

        def loss_fn(p):
            return self._noise_loss(p, frozen, batch, k_loss, dropout_key=k_drop)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return self._apply_update(state, loss, grads)

    # -- device-resident fast path (train/fastpath.py) -----------------------

    def _fast_epoch_impl(self, state: TrainState, frozen, data):
        """One epoch as a single on-device scan: draw minibatch indices,
        augment, VAE-encode, UNet step — no host round trips."""
        from psg_tpu.data.device_augment import augment_batch, normalize_batch
        from psg_tpu.train.fastpath import draw_minibatch

        n = data["images"].shape[0]
        bs = self.cfg.data.batch_size

        def body(st, _):
            rng = jax.random.fold_in(st.rng, st.step)
            k_idx, k_aug, k_loss, k_drop, k_var = jax.random.split(rng, 5)
            idx = draw_minibatch(k_idx, n, bs)
            imgs_u8 = data["images"][idx]
            if self.cfg.data.augment:
                imgs = augment_batch(imgs_u8, k_aug, self.ds.background)
            else:
                imgs = normalize_batch(imgs_u8)
            if self.caption_augment > 0:
                # draw a caption variant per sample; frozen-BERT encode
                # inside the step (~1 ms vs the 655M UNet fwd+bwd) —
                # cheaper in HBM than precomputing N*K embeddings
                v = jax.random.randint(k_var, (idx.shape[0],), 0,
                                       self.caption_augment)
                t_mask = data["text_mask_aug"][idx, v]
                t_emb = text_encoder_apply(
                    frozen["text"], data["text_ids_aug"][idx, v], t_mask,
                    self.bert_cfg, dtype=self.compute_dtype)
            else:
                t_emb = data["text_emb"][idx]
                t_mask = data["text_mask"][idx]

            def loss_fn(p):
                return self._noise_loss_emb(
                    p, frozen["vae"], imgs, t_emb,
                    t_mask, k_loss, dropout_key=k_drop)

            loss, grads = jax.value_and_grad(loss_fn)(st.params)
            return self._apply_update(st, loss, grads)

        return jax.lax.scan(body, state, None, length=self._fast_len)

    def _fast_val_impl(self, state: TrainState, frozen, ev):
        """All validation batches in one scanned call; exact weighted mean
        over real (non-padding) samples."""
        from psg_tpu.data.device_augment import normalize_batch

        def body(carry, inp):
            i, batch = inp
            rng = jax.random.fold_in(jax.random.fold_in(state.rng,
                                                        jnp.int32(-2)), i)
            loss = self._noise_loss_emb(
                state.params, frozen["vae"], normalize_batch(batch["images"]),
                batch["text_emb"], batch["text_mask"], rng,
                sample_weights=batch["weight"], train=False)
            w = jnp.sum(batch["weight"])
            return (carry[0] + loss * w, carry[1] + w), None

        nb = ev["images"].shape[0]
        (tot, cnt), _ = jax.lax.scan(
            body, (jnp.float32(0.0), jnp.float32(0.0)),
            (jnp.arange(nb), ev))
        return tot / jnp.maximum(cnt, 1.0)

    def _setup_fast_data(self):
        from functools import partial

        from psg_tpu.train.fastpath import device_split, eval_batches

        emb_fn = jax.jit(partial(
            lambda tp, ids, mask: text_encoder_apply(
                tp, ids, mask, self.bert_cfg, dtype=self.compute_dtype)))
        f = lambda ids, mask: emb_fn(self.frozen["text"], ids, mask)  # noqa: E731
        # with caption variants the step encodes its drawn variant itself —
        # don't burn HBM on per-sample embeddings that would go unused
        self._train_data = device_split(
            self.ds, self.train_loader.indices,
            text_emb_fn=None if self.caption_augment > 0 else f)
        ev = eval_batches(self.ds, self.val_loader.indices,
                          self.cfg.data.batch_size)
        nb, bs = ev["text_ids"].shape[:2]
        flat_emb = f(ev["text_ids"].reshape(nb * bs, -1),
                     ev["text_mask"].reshape(nb * bs, -1))
        ev["text_emb"] = flat_emb.reshape((nb, bs) + flat_emb.shape[1:])
        self._val_data = ev
        self._fast_len = max(len(self.train_loader), 1)
        self._fast_epoch = jax.jit(self._fast_epoch_impl, donate_argnums=(0,))
        self._fast_val = jax.jit(self._fast_val_impl)

    def train_epoch_fast(self, epoch: int) -> Dict[str, float]:
        self.state, ys = self._fast_epoch(self.state, self.frozen,
                                          self._train_data)
        loss = np.asarray(ys["loss"], np.float32)
        gn = np.asarray(ys["grad_norm"], np.float32)
        stats = {"loss": float(loss.mean()), "grad_norm": float(gn.mean()),
                 "grad_norm_max": float(gn.max())}
        self.metrics.scalars(stats, int(self.state.step),
                             prefix="diffusion_train/")
        return stats

    def validate_fast(self, epoch: int) -> float:
        val = float(self._fast_val(self.state, self.frozen, self._val_data))
        self.metrics.scalar("diffusion_val/loss", val, int(self.state.step))
        return val

    def _eval(self, state: TrainState, frozen, batch, valid):
        # mask wraparound-padded tail samples (loader pads the last eval
        # batch; padding at positions >= valid) so the weighted-mean loss
        # is exact over real samples only
        rng = jax.random.fold_in(state.rng, jnp.int32(-2))
        w = (jnp.arange(batch["image"].shape[0]) < valid).astype(jnp.float32)
        loss = self._noise_loss(state.params, frozen, batch, rng,
                                sample_weights=w, train=False)
        return {"loss": loss}

    def _sample(self, unet_params, frozen, rng, text_ids, text_mask, *,
                num: int, stride: int = 50, sampler: str = "ddim",
                steps: int = 100, guidance: float = 0.0):
        text_emb = text_encoder_apply(frozen["text"], text_ids, text_mask,
                                      self.bert_cfg, dtype=self.compute_dtype)
        mask_bias = text_bias_from_mask(text_mask)

        def denoise(x, t):
            out = unet_apply(unet_params, x.astype(text_emb.dtype), t, text_emb,
                             self.spec, text_mask=text_mask,
                             dtype=self.compute_dtype)
            if self.pred_type == "v":
                out = self.schedule.eps_from_v(out, x, t)
            return out

        shape = (num, self.latent_size, self.latent_size, self.cfg.model.latent_dim)
        if sampler == "fast":
            # the reference's strided sampler (parity mode)
            latents = ddpm_sample_fast(denoise, self.schedule, rng, shape=shape,
                                       stride=stride)
        elif sampler == "dpmpp":
            latents = dpmpp_2m_sample(denoise, self.schedule, rng, shape=shape,
                                      num_inference_steps=steps,
                                      clip_x0=self.cfg.model.latent_clamp)
        else:
            uncond = None
            if guidance > 0.0:
                zero_emb = jnp.zeros_like(text_emb)

                def uncond(x, t):  # noqa: F811 — cond-dropout's zero embedding
                    out = unet_apply(unet_params, x.astype(text_emb.dtype), t,
                                     zero_emb, self.spec, text_mask=text_mask,
                                     dtype=self.compute_dtype)
                    if self.pred_type == "v":
                        out = self.schedule.eps_from_v(out, x, t)
                    return out

            latents = ddim_sample(denoise, self.schedule, rng, shape=shape,
                                  num_inference_steps=steps,
                                  clip_x0=self.cfg.model.latent_clamp,
                                  guidance_scale=guidance,
                                  uncond_denoise_fn=uncond)
        return vae_decode(frozen["vae"], latents.astype(text_emb.dtype), text_emb,
                          text_bias=mask_bias, image_size=self.cfg.data.image_size,
                          dtype=self.compute_dtype)

    # -- loops -----------------------------------------------------------------

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        sums: Dict[str, float] = {}
        count = 0
        thr = Throughput()
        for batch in self.train_loader:
            b = {k: batch[k] for k in ("image", "text_ids", "text_mask")}
            if self.mesh is not None:
                from psg_tpu.parallel import shard_batch

                b = shard_batch(b, self.mesh)
            self.state, parts = self._train_step(self.state, self.frozen, b)
            count += 1
            thr.step()
            if count % self.cfg.training.log_every == 0:
                vals = {k: float(v) for k, v in parts.items()}
                self.metrics.scalars(vals, int(self.state.step),
                                     prefix="diffusion_train/")
                self.log.info("epoch %d step %d loss %.4f gnorm %.2f | %.0f b/h",
                              epoch, int(self.state.step), vals["loss"],
                              vals["grad_norm"], thr.batches_per_hour())
            for k, v in parts.items():
                # accumulate device arrays — float() here would force a
                # host sync every step
                sums[k] = sums.get(k, 0.0) + v
        return {k: float(v) / max(count, 1) for k, v in sums.items()}

    def validate(self, epoch: int) -> float:
        total, n = 0.0, 0
        for batch in self.val_loader:
            valid = int(batch["valid"])
            b = {k: batch[k] for k in ("image", "text_ids", "text_mask")}
            if self.mesh is not None:
                from psg_tpu.parallel import shard_batch

                b = shard_batch(b, self.mesh)
            parts = self._eval_step(self.state, self.frozen, b,
                                    jnp.int32(valid))
            total += float(parts["loss"]) * valid
            n += valid
        val = total / max(n, 1)
        self.metrics.scalar("diffusion_val/loss", val, int(self.state.step))
        return val

    def generate_samples(self, epoch: int, num: int = 8,
                         stride: Optional[int] = None):
        descs = self.ds.full_descriptions[:num]
        ids, mask = self.tokenizer.encode_batch(descs, self.cfg.data.text_len)
        rng = jax.random.fold_in(self.state.rng, 20_000 + epoch)
        # Epoch grids default to DDIM (extra.sample_sampler='fast' restores
        # the reference's strided sampler, with extra.sample_stride).  The
        # reference's striding repeats single-step posterior updates, which
        # cannot traverse the chain from a prior draw — round 3's confetti
        # grids at stride 50 were largely THIS sampler artifact (see
        # diffusion/sampling.py::ddim_sample).
        extra = self.cfg.extra or {}
        if stride is None:
            stride = int(extra.get("sample_stride", 50))
        imgs = self._sample_fn(self.state.sample_params, self.frozen, rng,
                               jnp.asarray(ids), jnp.asarray(mask),
                               num=num, stride=stride,
                               sampler=str(extra.get("sample_sampler", "ddim")),
                               steps=int(extra.get("sample_steps", 100)),
                               guidance=float(extra.get("sample_guidance", 0.0)))
        save_image_grid(np.asarray(imgs),
                        self.stage_dir / "samples" / f"epoch_{epoch:04d}.png",
                        captions=descs)

    def skipped_batches(self) -> int:
        """NaN-rejected (apply_if_finite) + norm-rejected
        (skip_above_global_norm) steps.  The norm guard's counter lives
        nested inside multi_transform state — sum every leaf reached via a
        'skipped' dict key so the log shows ALL silent rejections (a run
        whose healthy grad norms exceed the threshold looks alive while
        every step is zeroed; see round-3 log)."""
        total = 0
        try:
            total += int(self.state.opt_state.total_notfinite)
        except AttributeError:  # pragma: no cover
            pass
        from jax.tree_util import tree_flatten_with_path

        leaves, _ = tree_flatten_with_path(self.state.opt_state)
        for path, leaf in leaves:
            if any(getattr(k, "key", None) == "skipped" for k in path):
                total += int(leaf)
        return total

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

    def save_checkpoint_fast(self, epoch: int, val_loss) -> bool:
        """Fast-path policy: best checkpoints are LIGHT (bf16 sampling
        params only — serving/stage-3 need nothing more, and a full
        ~10 GB state costs ~15 min through the tunnel); periodic
        resume-grade full states keep their cadence."""
        tr = self.cfg.training
        meta = {"epoch": epoch, "vae_checkpoint": self.vae_ckpt_path,
                "config": self.cfg.to_dict()}
        is_best = False
        allow_best = val_loss is not None and (
            (epoch + 1) % max(tr.best_every, 1) == 0
            or epoch + 1 == tr.diffusion_epochs)
        if allow_best:
            is_best = self.ckpt.save_best_light(
                self.state.sample_params, int(self.state.step), val_loss,
                extra_meta=meta)
        if (epoch + 1) % tr.save_every == 0:
            self.ckpt.save(self.state, int(self.state.step), None,
                           extra_meta=meta, periodic=True)
        return is_best

    def load_checkpoint(self, path: Optional[str] = None):
        if path is None:
            self.state, meta = self.ckpt.restore(self.state, best=True)
        else:
            meta = load_metadata(path)
            try:
                self.state = load_state(path, self.state)
            except Exception as e:  # optimizer-chain shape changed between
                # runs (e.g. a new transform like skip_grad_norm): restore
                # params + step, rebuild fresh optimizer state (Adam
                # moments re-warm within a few hundred steps)
                self.log.warning(
                    "strict restore failed (%s) — params-only restore", e)
                from psg_tpu.core.checkpoint import load_params

                params = load_params(path, self.state.params)
                ema = (jax.tree_util.tree_map(jnp.array, params)
                       if self.ema_decay > 0 else ())
                self.state = TrainState(
                    jnp.asarray(int(meta.get("step", 0)), jnp.int32), params,
                    self.tx.init(params), self.state.rng, ema)
        self.start_epoch = int(meta.get("epoch", -1)) + 1
        self.best_val = float(meta.get("metric", float("inf")))

    def train(self) -> Path:
        if self.cfg.training.fast_path and self.mesh is None:
            return self._train_fast()
        # classic/mesh path: caption variants are drawn per sample in the
        # HOST loader (data/loader.py::_make_batch — ds.set_caption_variants
        # ran in __init__, so train batches carry variant text_ids/mask);
        # the device fast path draws its variants on device instead.  The
        # round-4 NotImplementedError guard is gone: the best training
        # recipe now runs multi-device (VERDICT r4 #6).
        return self._train_classic()

    def _train_fast(self) -> Path:
        """Device-resident training: ~1 host call per epoch (see
        train/fastpath.py for why this matters on a tunneled TPU)."""
        tr = self.cfg.training
        epochs = tr.diffusion_epochs
        self._setup_fast_data()
        self.log.info("stage 2 (fast path): %d epochs x %d scanned steps, "
                      "batch %d, ema %.4f", epochs, self._fast_len,
                      self.cfg.data.batch_size, self.ema_decay)
        t_start = time.time()
        for epoch in range(self.start_epoch, epochs):
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
                "epoch %d done in %.1fs (%.1f steps/s): train %.4f "
                "gnorm %.2f/%.2f val %s skipped %d",
                epoch, dt, self._fast_len / max(dt, 1e-9), stats["loss"],
                stats["grad_norm"], stats["grad_norm_max"],
                f"{val_loss:.4f}" if val_loss is not None else "-",
                self.skipped_batches())
        if epochs > self.start_epoch:
            self.ckpt.save(self.state, int(self.state.step), None,
                           extra_meta={"epoch": epochs - 1,
                                       "vae_checkpoint": self.vae_ckpt_path,
                                       "config": self.cfg.to_dict()},
                           periodic=True)
        self.log.info("stage 2 fast path: %d epochs in %.1f min",
                      epochs - self.start_epoch,
                      (time.time() - t_start) / 60.0)
        self.metrics.flush()
        return self.ckpt.best_path

    def _train_classic(self) -> Path:
        epochs = self.cfg.training.diffusion_epochs
        self.log.info("stage 2: %d epochs, %d train batches/epoch",
                      epochs, len(self.train_loader))
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
            self.log.info(
                "epoch %d done in %.1fs: train %.4f val %.4f skipped %d",
                epoch, time.time() - t0, stats.get("loss", 0.0), val_loss,
                self.skipped_batches())
        # final-state periodic write regardless of cadence: long runs on
        # this host must restart in chunks (the tunnel client leaks host
        # memory per call), and a chunk must never end without a resume point
        if epochs > self.start_epoch:
            self.ckpt.save(self.state, int(self.state.step), None,
                           extra_meta={"epoch": epochs - 1,
                                       "vae_checkpoint": self.vae_ckpt_path,
                                       "config": self.cfg.to_dict()},
                           periodic=True)
        self.metrics.flush()
        return self.ckpt.best_path
