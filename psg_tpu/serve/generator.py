"""Serving-path generator: text -> sprite and image+text -> sprite.

Covers ``PokemonGradioGenerator`` (gradio_app.py:161-465):

- text->sprite: prior noise -> DDPM chain -> VAE decode
  (gradio_app.py:363-392), using the serving renoise sampler
  (gradio_app.py:297-361) by default for behavioral parity — other
  samplers selectable;
- image+text->sprite: encode input, latent lerp
  ``latent*(1-s) + noise*s`` (gradio_app.py:423-426), then the same chain;
- seeded reproducibility via explicit PRNG keys (the reference calls
  torch.manual_seed, gradio_app.py:376-379);
- the serving schedule is LINEAR betas (gradio_app.py:282-284) regardless
  of the training schedule — kept, behind ``schedule_kind``.

TPU-native: the whole chain (text encode -> scan sampler -> decode) is one
jitted function; ``generate_batch`` shards the batch over the mesh 'data'
axis for the >=64-sprite serving target (BASELINE.json config 5).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from psg_tpu.core.checkpoint import load_state
from psg_tpu.core.config import Config
from psg_tpu.diffusion import make_schedule
from psg_tpu.diffusion.sampling import (
    ddim_sample,
    ddpm_sample,
    ddpm_sample_fast,
    ddpm_sample_renoise,
    dpmpp_2m_sample,
    ddpm_sample_x0,
)
from psg_tpu.models.text_encoder import text_encoder_apply, text_encoder_init
from psg_tpu.models.unet import text_bias_from_mask, unet_apply, unet_init
from psg_tpu.models.vae import (
    latent_size_for,
    reparameterize,
    vae_decode,
    vae_encoder_apply,
    vae_init,
)
from psg_tpu.parallel import batch_sharding, make_mesh, replicated
from psg_tpu.train.stage1_vae import bert_config_for, get_tokenizer
from psg_tpu.train.stage2_diffusion import unet_spec_from_config
from psg_tpu.train.state import TrainState
from psg_tpu.utils.images import pil_to_array, tensor_to_pil

_SAMPLERS = {
    "ddim": ddim_sample,              # quality default: correct striding + CFG
    "dpmpp": dpmpp_2m_sample,         # 2nd-order: DDIM@50 quality in ~10 evals
    "renoise": ddpm_sample_renoise,   # gradio parity variant
    "ddpm": ddpm_sample,              # canonical posterior-variance
    "fast": ddpm_sample_fast,
    "x0": ddpm_sample_x0,
}


class _TfidfIndex:
    """Log-TF-IDF cosine retrieval over the caption corpus.

    The lexical half of hybrid caption retrieval: the trained text tower
    keys on exact caption wording (name-free paraphrases retrieve at 0/16,
    docs/ROUND3_NOTES.md), while content-word TF-IDF retrieves 12/16 of
    the same paraphrases — so reworded prompts still map to the right
    sprite for ``--init retrieval`` seeding.  Dense [N, V] is ~20 MB for
    the 898-caption corpus; queries are one matvec."""

    _TOKEN = None  # compiled lazily (module import stays regex-free)

    def __init__(self, corpus: Sequence[str]):
        import re

        if _TfidfIndex._TOKEN is None:
            _TfidfIndex._TOKEN = re.compile(r"[a-z]+")
        token = _TfidfIndex._TOKEN
        from collections import Counter

        docs = [Counter(token.findall(d.lower())) for d in corpus]
        df = Counter()
        for d in docs:
            df.update(d.keys())
        self.vocab = {w: i for i, w in enumerate(sorted(df))}
        n = len(docs)
        self.idf = np.zeros(len(self.vocab), np.float32)
        for w, i in self.vocab.items():
            self.idf[i] = np.log(n / (1.0 + df[w]))
        mat = np.zeros((n, len(self.vocab)), np.float32)
        for r, d in enumerate(docs):
            for w, c in d.items():
                mat[r, self.vocab[w]] = (1.0 + np.log(c)) * self.idf[self.vocab[w]]
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-8)
        self.mat = mat

    def _vec(self, text: str) -> np.ndarray:
        from collections import Counter

        q = np.zeros(self.mat.shape[1], np.float32)
        for w, c in Counter(
                _TfidfIndex._TOKEN.findall(text.lower())).items():
            i = self.vocab.get(w)
            if i is not None:
                q[i] = (1.0 + np.log(c)) * self.idf[i]
        return q / max(float(np.linalg.norm(q)), 1e-8)

    def sims(self, text: str) -> np.ndarray:
        """Cosine similarity of ``text`` against every corpus caption."""
        return self.mat @ self._vec(text)


class PokemonGenerator:
    def __init__(self, cfg: Config, vae_checkpoint=None, diffusion_checkpoint=None,
                 tokenizer=None, mesh=None, schedule_kind: str = "linear",
                 sampler: str = "ddim", guidance_scale: float = 0.0,
                 negative: str = "zero", retrieval_mode: str = "hybrid",
                 prediction_type: str = "eps"):
        self.cfg = cfg
        self.retrieval_mode = retrieval_mode
        # 'eps' (reference semantics) or 'v': a v-trained UNet's outputs
        # are converted to eps (schedule.eps_from_v) before every sampler,
        # keyed off the checkpoint sidecar in build_generator — sampling a
        # v model as eps produces pure noise, so this must follow the
        # training config, never a user default.
        if prediction_type not in ("eps", "v"):
            raise ValueError(f"unknown prediction_type {prediction_type!r}")
        self.prediction_type = prediction_type
        # kept for introspection/stamping (scripts/eval_conditioning.py)
        self.vae_checkpoint = str(vae_checkpoint) if vae_checkpoint else None
        self.diffusion_checkpoint = (str(diffusion_checkpoint)
                                     if diffusion_checkpoint else None)
        self.compute_dtype = (
            jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else None
        )
        self.latent_size = latent_size_for(cfg.data.image_size)
        self.spec = unet_spec_from_config(cfg, self.latent_size)
        m = cfg.model
        # serving uses a linear beta schedule (gradio_app.py:282-284)
        self.schedule = make_schedule(m.num_timesteps, m.beta_start, m.beta_end,
                                      schedule_kind)
        self.sampler_name = sampler
        self.guidance_scale = float(guidance_scale)
        # Inference-time CFG shaping (no retraining; ddim/dpmpp only):
        # - extra.guidance_rescale in [0,1]: blend toward a std-rescaled
        #   guided eps (Lin et al. 2023 §3.4 — CFG inflates the noise
        #   prediction's variance, which washes out structure exactly the
        #   way the from-prior grids show); 0 = off.
        # - extra.guidance_interval_lo/hi (fractions of T): apply CFG only
        #   for lo*T <= t <= hi*T (Kynkäänniemi et al. 2024 — guidance at
        #   the extreme noise levels hurts; the band keeps it where it
        #   helps).  Defaults (0,1) = all steps.
        self.guidance_rescale = float(cfg.extra.get("guidance_rescale", 0.0))
        T = m.num_timesteps
        self.guidance_t_lo = float(cfg.extra.get("guidance_interval_lo", 0.0)) * T
        self.guidance_t_hi = float(cfg.extra.get("guidance_interval_hi", 1.0)) * T
        self.mesh = mesh

        if tokenizer is None:
            stage_dir = Path(cfg.experiment_dir)
            try:
                tokenizer = get_tokenizer(cfg, stage_dir)
            except FileNotFoundError:
                from psg_tpu.data.dataset import read_description_csv, full_description
                from psg_tpu.text import WordPieceTokenizer

                rows = read_description_csv(cfg.data.csv_path)
                corpus = [full_description(r["english_name"], r["description"])
                          for r in rows]
                tokenizer = WordPieceTokenizer.from_corpus(corpus)
        self.tokenizer = tokenizer
        self.bert_cfg = bert_config_for(cfg, tokenizer.vocab_size)

        self.params = self._load(vae_checkpoint, diffusion_checkpoint)
        if self.compute_dtype is not None:
            # Store matmul kernels in the compute dtype: bit-identical
            # outputs (apply fns cast w to compute_dtype anyway), half the
            # HBM + host->device transfer for the 2.6 GB UNet, and the
            # denoise loop's per-step weight reads halve.
            from psg_tpu.nn.layers import cast_matmul_weights

            self.params = cast_matmul_weights(self.params, self.compute_dtype)
        if mesh is not None:
            if mesh.shape.get("model", 1) > 1:
                # TP serving: UNet channels shard over 'model' so a
                # batch smaller than the mesh still uses every chip
                from psg_tpu.parallel import param_shardings, unet_tp_rules

                rule = unet_tp_rules(int((cfg.extra or {}).get(
                    "tp_min_channels", 640)))
                self.params = {
                    "unet": jax.device_put(
                        self.params["unet"],
                        param_shardings(self.params["unet"], mesh, rule)),
                    "vae": jax.device_put(self.params["vae"], replicated(mesh)),
                    "text": jax.device_put(self.params["text"], replicated(mesh)),
                }
            else:
                self.params = jax.device_put(self.params, replicated(mesh))

        # CFG negative branch.  "zero": the cond-dropout zero embedding
        # (needs a checkpoint trained with extra.cond_dropout).  "mean":
        # the mean dataset-caption embedding — an IN-distribution negative
        # that needs no special training: eps = (1+g)eps(c) - g eps(mean)
        # extrapolates away from the average prompt (the mode-averaging
        # direction).  Any other string: a negative prompt.
        self.negative = negative
        self._neg_emb = self._neg_mask = None
        if negative != "zero":
            self._neg_emb, self._neg_mask = self._negative_embedding(negative)

        self._generate = jax.jit(
            self._generate_impl, static_argnames=("steps", "num", "sampler"))
        self._encode_image = jax.jit(self._encode_impl)

    def set_guidance(self, scale=None, rescale=None,
                     interval_lo=None, interval_hi=None) -> None:
        """Change the CFG shaping knobs on a live generator.

        The knobs are BAKED INTO the compiled chain as constants (jit
        caches by function identity), so mutating the attributes alone
        would silently keep sampling under the previous recipe — this is
        the one supported way to retune guidance without rebuilding the
        generator (scripts/recipe_sweep.py measures recipes through it).
        ``interval_lo/hi`` are fractions of T, like the config keys.
        """
        if scale is not None:
            self.guidance_scale = float(scale)
        if rescale is not None:
            self.guidance_rescale = float(rescale)
        T = self.cfg.model.num_timesteps
        if interval_lo is not None:
            self.guidance_t_lo = float(interval_lo) * T
        if interval_hi is not None:
            self.guidance_t_hi = float(interval_hi) * T
        self._generate = jax.jit(
            self._generate_impl, static_argnames=("steps", "num", "sampler"))

    # -- weights -----------------------------------------------------------

    def _load(self, vae_ckpt, diff_ckpt):
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
        from psg_tpu.core.checkpoint import load_serving_params

        # handles both the stage-3 'final' bundle (vae==diff carries
        # {vae,text,unet}) and the stage-1/2 pair (EMA-preferring UNet)
        params, _ = load_serving_params(
            vae_ckpt, diff_ckpt,
            {"vae": vae_tmpl["vae"], "text": vae_tmpl["text"],
             "unet": unet_tmpl})
        return params

    # -- jitted chain --------------------------------------------------------

    def _encode_impl(self, params, rng, image):
        mu, logvar = vae_encoder_apply(params["vae"]["encoder"], image,
                                       dtype=self.compute_dtype)
        return reparameterize(rng, mu, logvar)

    def _negative_embedding(self, negative: str, max_captions: int = 128):
        """-> ([1,S,D] embedding, [1,S] mask) for the CFG negative branch."""
        if negative == "mean":
            from psg_tpu.data.dataset import (full_description,
                                              read_description_csv)

            rows = read_description_csv(self.cfg.data.csv_path)[:max_captions]
            caps = [full_description(r["english_name"], r["description"])
                    for r in rows]
        else:
            caps = [negative]
        ids, mask = self.tokenizer.encode_batch(caps, self.cfg.data.text_len)
        ids, mask = jnp.asarray(ids), jnp.asarray(mask)
        emb = jax.jit(lambda p, i, m: text_encoder_apply(
            p, i, m, self.bert_cfg, dtype=self.compute_dtype))(
                self.params["text"], ids, mask)
        if negative == "mean":
            # average the per-caption sequence embeddings; attend to every
            # position in the negative branch (union-style mask)
            return (jnp.mean(emb.astype(jnp.float32), axis=0,
                             keepdims=True).astype(emb.dtype),
                    jnp.ones((1, mask.shape[1]), mask.dtype))
        return emb, mask

    def _generate_impl(self, params, rng, text_ids, text_mask,
                       initial_latent=None, *, steps: int, num: int,
                       sampler: str):
        text_emb = text_encoder_apply(params["text"], text_ids, text_mask,
                                      self.bert_cfg, dtype=self.compute_dtype)

        def denoise(x, t):
            out = unet_apply(params["unet"], x.astype(text_emb.dtype), t,
                             text_emb, self.spec, text_mask=text_mask,
                             dtype=self.compute_dtype)
            if self.prediction_type == "v":
                out = self.schedule.eps_from_v(out, x, t)
            return out

        shape = (num, self.latent_size, self.latent_size,
                 self.cfg.model.latent_dim)
        fn = _SAMPLERS[sampler]
        if sampler in ("ddim", "dpmpp"):
            guided = denoise
            if self.guidance_scale > 0.0:
                if self._neg_emb is not None:
                    neg_emb = jnp.broadcast_to(
                        self._neg_emb.astype(text_emb.dtype),
                        text_emb.shape)
                    neg_mask = jnp.broadcast_to(self._neg_mask,
                                                text_mask.shape)
                else:  # cond-dropout zero embedding
                    neg_emb = jnp.zeros_like(text_emb)
                    neg_mask = text_mask

                # Fused CFG: both branches in ONE batch-2N UNet call, so
                # the 1.3 GB of weights is read once per step, not twice —
                # ~2x guided sampling at the bandwidth-bound small batches
                # serving runs at.  The guided eps is combined here in
                # fp32 (exactly the samplers' formula), so the sampler
                # runs with guidance 0.
                emb_cat = jnp.concatenate([text_emb, neg_emb], axis=0)
                mask_cat = jnp.concatenate([text_mask, neg_mask], axis=0)
                g = self.guidance_scale
                resc = self.guidance_rescale
                t_lo, t_hi = self.guidance_t_lo, self.guidance_t_hi

                def guided(x, t):
                    xx = jnp.concatenate([x, x], axis=0)
                    tt = jnp.concatenate([t, t], axis=0)
                    eps = unet_apply(params["unet"],
                                     xx.astype(text_emb.dtype), tt, emb_cat,
                                     self.spec, text_mask=mask_cat,
                                     dtype=self.compute_dtype)
                    if self.prediction_type == "v":
                        # linear in the model output, so converting the
                        # fused batch-2N before the split is exact
                        eps = self.schedule.eps_from_v(eps, xx, tt)
                    e_c, e_u = jnp.split(eps.astype(jnp.float32), 2, axis=0)
                    # guidance interval: zero the CFG term outside the band
                    # (all samples in the scan step share one t)
                    g_eff = jnp.where((t[0] >= t_lo) & (t[0] <= t_hi), g, 0.0)
                    e_g = (1.0 + g_eff) * e_c - g_eff * e_u
                    if resc > 0.0:
                        # CFG-rescale: restore the conditional branch's
                        # per-sample std, then blend (diffusers'
                        # guidance_rescale formula on the eps prediction)
                        std_c = jnp.std(e_c, axis=(1, 2, 3), keepdims=True)
                        std_g = jnp.std(e_g, axis=(1, 2, 3), keepdims=True)
                        e_r = e_g * (std_c / jnp.maximum(std_g, 1e-8))
                        e_g = resc * e_r + (1.0 - resc) * e_g
                    return e_g

            latents = fn(guided, self.schedule, rng, shape=shape,
                         initial_latent=initial_latent,
                         num_inference_steps=steps,
                         clip_x0=self.cfg.model.latent_clamp)
        elif sampler == "renoise":
            latents = fn(denoise, self.schedule, rng, shape=shape,
                         initial_latent=initial_latent,
                         num_inference_steps=steps)
        elif sampler == "x0":
            latents = fn(denoise, self.schedule, rng, shape=shape,
                         initial_latent=initial_latent,
                         num_inference_steps=steps)
        elif sampler == "fast":
            stride = max(1, self.schedule.num_timesteps // steps)
            latents = fn(denoise, self.schedule, rng, shape=shape,
                         initial_latent=initial_latent, stride=stride)
        else:  # "ddpm" — canonical posterior-variance, strided to `steps`
            latents = fn(denoise, self.schedule, rng, shape=shape,
                         initial_latent=initial_latent,
                         num_inference_steps=steps)
        return vae_decode(params["vae"], latents.astype(text_emb.dtype),
                          text_emb, text_bias=text_bias_from_mask(text_mask),
                          image_size=self.cfg.data.image_size,
                          dtype=self.compute_dtype)

    # -- public API ------------------------------------------------------------

    def _key(self, seed: Optional[int]) -> jax.Array:
        if seed is None:
            seed = int(np.random.randint(0, 2**31 - 1))
        return jax.random.PRNGKey(seed)

    def _restart_passes(self, imgs, ids, mask, key, *, steps, num, sampler,
                        restarts: int, strength: float):
        """Restart sampling (cf. Xu et al. 2023): re-encode the draft, mix
        hard with fresh noise, resample.  Measured on the trained
        checkpoint: one 0.9-strength restart markedly solidifies structure
        and prompt color vs the single pass (docs/samples/ — the denoiser
        is much stronger given any data seed than from the pure prior)."""
        for i in range(restarts):
            k_enc, k_noise, k_sample, key = jax.random.split(
                jax.random.fold_in(key, 100 + i), 4)
            latent = self._encode_image(self.params, k_enc, imgs)
            noise = jax.random.normal(k_noise, latent.shape, latent.dtype)
            latent = latent * (1.0 - strength) + noise * strength
            imgs = self._generate(self.params, k_sample, ids, mask, latent,
                                  steps=steps, num=num, sampler=sampler)
        return imgs

    def generate_from_text(self, description: str,
                           num_inference_steps: int = 50,
                           seed: Optional[int] = None,
                           restarts: int = 0,
                           restart_strength: float = 0.9) -> Image.Image:
        """gradio_app.py:363-392.  ``restarts`` > 0 runs that many restart
        passes after the base chain (see :meth:`_restart_passes`)."""
        ids, mask = self.tokenizer.encode_batch([description],
                                                self.cfg.data.text_len)
        ids, mask = jnp.asarray(ids), jnp.asarray(mask)
        key = self._key(seed)
        imgs = self._generate(self.params, key, ids, mask, None,
                              steps=num_inference_steps, num=1,
                              sampler=self.sampler_name)
        if restarts > 0:
            imgs = self._restart_passes(imgs, ids, mask, key,
                                        steps=num_inference_steps, num=1,
                                        sampler=self.sampler_name,
                                        restarts=restarts,
                                        strength=restart_strength)
        return tensor_to_pil(np.asarray(imgs[0]))

    # -- retrieval-seeded generation (beyond the reference) ------------------

    def _retrieval_index(self):
        """Lazy (pooled caption embeddings [N,D], dataset, TF-IDF matrix)
        for nearest-caption lookup.  Built from the serving config's
        dataset paths.

        Two complementary similarity spaces: the trained text tower's
        masked-mean embedding (exact-wording matches — the from-scratch
        BERT keys on trained caption wording, docs/ROUND3_NOTES.md), and a
        corpus TF-IDF cosine (content-word matches — measured 12/16 exact
        species retrieval on name-free paraphrases where the embedding
        scores 0/16)."""
        if getattr(self, "_retr", None) is None:
            from psg_tpu.data.dataset import PokemonDataset

            ds = PokemonDataset(self.cfg.data.csv_path, self.cfg.data.image_dir,
                                image_size=self.cfg.data.image_size,
                                text_len=self.cfg.data.text_len)
            ids, mask = self.tokenizer.encode_batch(ds.full_descriptions,
                                                    self.cfg.data.text_len)
            ids, mask = jnp.asarray(ids), jnp.asarray(mask)
            emb_fn = jax.jit(lambda p, i, m: text_encoder_apply(
                p, i, m, self.bert_cfg, dtype=self.compute_dtype))
            pooled = []
            for s in range(0, ids.shape[0], 64):
                e = emb_fn(self.params["text"], ids[s:s + 64], mask[s:s + 64])
                m = mask[s:s + 64, :, None].astype(jnp.float32)
                pooled.append(np.asarray(
                    jnp.sum(e.astype(jnp.float32) * m, axis=1)
                    / jnp.maximum(jnp.sum(m, axis=1), 1.0)))
            pooled = np.concatenate(pooled, axis=0)
            pooled /= np.maximum(np.linalg.norm(pooled, axis=1, keepdims=True),
                                 1e-8)
            self._retr = (pooled, ds, _TfidfIndex(ds.full_descriptions))
        return self._retr

    def _query_embedding(self, description: str) -> np.ndarray:
        """L2-normalized masked-mean text embedding of one description."""
        ids, mask = self.tokenizer.encode_batch([description],
                                                self.cfg.data.text_len)
        if getattr(self, "_embed_fn", None) is None:
            # cached: a fresh jit(lambda) per query would re-trace every call
            self._embed_fn = jax.jit(lambda p, i, m: text_encoder_apply(
                p, i, m, self.bert_cfg, dtype=self.compute_dtype))
        e = self._embed_fn(self.params["text"], jnp.asarray(ids),
                           jnp.asarray(mask))
        m = jnp.asarray(mask)[:, :, None].astype(jnp.float32)
        q = np.array(jnp.sum(e.astype(jnp.float32) * m, axis=1)
                     / jnp.maximum(jnp.sum(m, axis=1), 1.0))[0]
        return q / max(float(np.linalg.norm(q)), 1e-8)

    def retrieve_nearest(self, description: str,
                         exclude: Optional[int] = None,
                         mode: Optional[str] = None) -> int:
        """Index of the dataset sprite whose caption is closest to
        ``description``.  ``mode``: 'hybrid' (default — mean of embedding
        and TF-IDF cosines; robust to rewording), 'embed' (text-tower
        only), 'lexical' (TF-IDF only).  ``exclude`` masks one index out
        (leave-one-out evaluation)."""
        mode = mode or self.retrieval_mode
        pooled, _, tfidf = self._retrieval_index()
        sims = 0.0
        if mode in ("hybrid", "embed"):
            sims = sims + pooled @ self._query_embedding(description)
        if mode in ("hybrid", "lexical"):
            sims = sims + tfidf.sims(description)
        if mode == "hybrid":
            sims = sims / 2.0
        if exclude is not None:
            sims = sims.copy()
            sims[exclude] = -np.inf
        return int(np.argmax(sims))

    def generate_from_text_retrieval(self, description: str,
                                     num_inference_steps: int = 50,
                                     seed: Optional[int] = None,
                                     strength: float = 0.85,
                                     restarts: int = 0,
                                     exclude: Optional[int] = None) -> Image.Image:
        """Text->sprite seeded from the nearest dataset sprite's latent
        (automatic img2img): the denoiser is measurably stronger from any
        data-seeded latent than from the pure prior (ROUND3_NOTES), so
        structure comes from the retrieved neighbor at ``strength`` noise
        while color/identity follow the prompt."""
        idx = self.retrieve_nearest(description, exclude=exclude)
        _, ds, _ = self._retrieval_index()
        key = self._key(seed)
        k_enc, k_noise, k_sample = jax.random.split(key, 3)
        arr = jnp.asarray(ds.image_float(idx)[None])
        latent = self._encode_image(self.params, k_enc, arr)
        noise = jax.random.normal(k_noise, latent.shape, latent.dtype)
        latent = latent * (1.0 - strength) + noise * strength
        ids, mask = self.tokenizer.encode_batch([description],
                                                self.cfg.data.text_len)
        ids, mask = jnp.asarray(ids), jnp.asarray(mask)
        imgs = self._generate(self.params, k_sample, ids, mask, latent,
                              steps=num_inference_steps, num=1,
                              sampler=self.sampler_name)
        if restarts > 0:
            imgs = self._restart_passes(imgs, ids, mask, key,
                                        steps=num_inference_steps, num=1,
                                        sampler=self.sampler_name,
                                        restarts=restarts, strength=strength)
        return tensor_to_pil(np.asarray(imgs[0]))

    def generate_from_image_and_text(self, input_image: Image.Image,
                                     description: str,
                                     num_inference_steps: int = 50,
                                     noise_strength: float = 0.7,
                                     seed: Optional[int] = None) -> Image.Image:
        """img2img via latent lerp (gradio_app.py:394-438)."""
        key = self._key(seed)
        k_enc, k_noise, k_sample = jax.random.split(key, 3)
        arr = pil_to_array(input_image, self.cfg.data.image_size)[None]
        latent = self._encode_image(self.params, k_enc, jnp.asarray(arr))
        if noise_strength > 0:
            noise = jax.random.normal(k_noise, latent.shape, latent.dtype)
            latent = latent * (1.0 - noise_strength) + noise * noise_strength
        ids, mask = self.tokenizer.encode_batch([description],
                                                self.cfg.data.text_len)
        imgs = self._generate(self.params, k_sample, jnp.asarray(ids),
                              jnp.asarray(mask), latent,
                              steps=num_inference_steps, num=1,
                              sampler=self.sampler_name)
        return tensor_to_pil(np.asarray(imgs[0]))

    def generate_batch(self, descriptions: Sequence[str],
                       num_inference_steps: int = 50,
                       seed: Optional[int] = None,
                       sampler: Optional[str] = None,
                       restarts: int = 0,
                       restart_strength: float = 0.9,
                       init: str = "prior",
                       init_strength: float = 0.85) -> np.ndarray:
        """Batched sharded serving: N descriptions -> [N,H,W,3] in [-1,1].

        With a mesh, the batch is sharded over 'data' (ICI collectives via
        XLA) — BASELINE config 5's >=64-sprite case.  ``init='retrieval'``
        seeds every chain from its prompt's nearest dataset sprite
        (:meth:`generate_from_text_retrieval`, batched).
        """
        n = len(descriptions)
        init_images = None
        if init == "retrieval":
            _, ds, _ = self._retrieval_index()
            init_images = np.stack([
                ds.image_float(self.retrieve_nearest(d))
                for d in descriptions])
        ids, mask = self.tokenizer.encode_batch(list(descriptions),
                                                self.cfg.data.text_len)
        ids, mask = np.asarray(ids), np.asarray(mask)
        num = n
        if self.mesh is not None:
            # pad to a multiple of the 'data' axis so small batches
            # (batch < n_devices) still shard; padding rows are sliced
            # off after generation
            d = self.mesh.shape.get("data", 1)
            if n % d:
                pad = d - n % d
                ids = np.concatenate([ids, np.repeat(ids[-1:], pad, 0)])
                mask = np.concatenate([mask, np.repeat(mask[-1:], pad, 0)])
                num = n + pad
            ids = jax.device_put(jnp.asarray(ids), batch_sharding(self.mesh, 2))
            mask = jax.device_put(jnp.asarray(mask),
                                  batch_sharding(self.mesh, 2))
        else:
            ids, mask = jnp.asarray(ids), jnp.asarray(mask)
        key = self._key(seed)
        latent = None
        if init_images is not None:
            if init_images.shape[0] < num:  # mesh padding rows
                init_images = np.concatenate(
                    [init_images,
                     np.repeat(init_images[-1:], num - init_images.shape[0], 0)])
            k_enc, k_noise, key = jax.random.split(key, 3)
            latent = self._encode_image(self.params, k_enc,
                                        jnp.asarray(init_images))
            noise = jax.random.normal(k_noise, latent.shape, latent.dtype)
            latent = latent * (1.0 - init_strength) + noise * init_strength
        imgs = self._generate(self.params, key, ids, mask, latent,
                              steps=num_inference_steps, num=num,
                              sampler=sampler or self.sampler_name)
        if restarts > 0:
            imgs = self._restart_passes(imgs, ids, mask, key,
                                        steps=num_inference_steps, num=num,
                                        sampler=sampler or self.sampler_name,
                                        restarts=restarts,
                                        strength=restart_strength)
        return np.asarray(imgs)[:n]
