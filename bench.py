"""Headline benchmark: UNet denoise throughput on real TPU hardware.

Measures the flagship metric from BASELINE.json — denoise steps/sec/chip on
the full-size 655M-param UNet (text_dim 768, batch 8, bf16 compute, the
whole sampling loop as one on-device lax.scan) — and derives end-to-end
sprites/min at 1000-step DDPM.  Baseline target: 200 steps/s/chip.

Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_STEPS_PER_SEC = 200.0  # driver-set target (BASELINE.json)
PEAK_BF16_TFLOPS = {"TPU v5 lite": 197.0}  # per-chip peak, by device prefix


def _peak_tflops(device_str: str):
    for prefix, peak in PEAK_BF16_TFLOPS.items():
        if device_str.startswith(prefix):
            return peak
    return None


def _require_backend(timeout_s: float = 420.0):
    """Fail fast with one JSON error line if the device backend cannot be
    reached (a dead TPU tunnel otherwise hangs discovery indefinitely)."""
    import threading

    result = {}

    def probe():
        try:
            import jax

            result["devices"] = [str(d) for d in jax.devices()]
        except Exception as e:  # noqa: BLE001
            result["error"] = str(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive() or "error" in result:
        err = result.get("error", f"backend unreachable after {timeout_s:.0f}s")
        print(json.dumps({"metric": "denoise_steps_per_sec_per_chip",
                          "value": None, "unit": "steps/s",
                          "vs_baseline": None, "error": err}))
        sys.exit(1)


def _flops_of(compiled) -> float:
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def _serving_setup():
    """Full-size serving state shared by `serve` mode and the default
    mode's quality-recipe row: init {unet, text, vae}, load the best
    trained checkpoint pair via serve/hub resolution, pick the trained
    beta schedule.  Returns a dict."""
    import jax
    import jax.numpy as jnp

    from psg_tpu.core.initutil import jit_init
    from psg_tpu.diffusion import ddpm_sample_fast, make_schedule
    from psg_tpu.models.bert import BertConfig
    from psg_tpu.models.text_encoder import text_encoder_apply, text_encoder_init
    from psg_tpu.models.unet import UNetSpec, text_bias_from_mask, unet_apply, unet_init
    from psg_tpu.models.vae import vae_decode, vae_init

    import os

    smoke = bool(os.environ.get("PSG_BENCH_SMOKE"))
    if smoke:  # tiny shapes: validates the bench code path off-TPU
        spec = UNetSpec(text_dim=48, num_heads=2, time_emb_dim=32,
                        channels=(16, 24, 32, 32), spatial=(8, 4, 2, 1))
        bert_cfg = BertConfig.tiny_test()
    else:
        spec = UNetSpec(text_dim=768, num_heads=4)
        bert_cfg = BertConfig.base()
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    to_bf16 = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), t)
    image_size, latent_size = (64, 8) if smoke else (215, 27)
    width_scale = 0.25 if smoke else 1.0
    params = {
        "unet": jax.jit(lambda k: to_bf16(unet_init(k, spec)))(k1),
        "text": jit_init(text_encoder_init, k2, bert_cfg, spec.text_dim),
        "vae": jit_init(vae_init, k3, 8, spec.text_dim,
                        width_scale=width_scale),
    }
    # prefer trained evidence checkpoints when present so the serving row
    # measures the real deployed chain, not just random-weight throughput
    # (VERDICT r2); throughput itself is weight-value independent.
    # Resolution goes through serve/hub.py: recorded-best ranking + the
    # VAE paired to the chosen UNet's latent space (ADVICE r3 — the old
    # newest-mtime glob could pair checkpoints across runs, or pick one
    # mid-write and silently fall back to random weights).
    weights = "random"
    ckpt_info = {}
    from pathlib import Path

    from psg_tpu.core.checkpoint import load_serving_params
    from psg_tpu.core.config import Config
    from psg_tpu.serve.hub import resolve_checkpoints

    vae_ck, diff_ck = (None, None)
    if not smoke:
        vae_ck, diff_ck = resolve_checkpoints(Config(), allow_hub=False)
    ckpt_info = {"vae": vae_ck, "diffusion": diff_ck}
    try:
        # same loader as serve/generator.py — handles the stage-3 'final'
        # bundle (vae==diff carries {vae,text,unet}) as well as the pair
        params, loaded = load_serving_params(vae_ck, diff_ck, params)
        weights = {"final-bundle": "trained", "pair": "trained",
                   "vae-only": "trained-vae", "unet-only": "trained",
                   "none": "random"}[loaded]
    except Exception as e:  # make the random-weights fallback VISIBLE
        weights = f"random (load failed: {type(e).__name__}: {e})"
        print(f"WARNING: checkpoint load failed ({e}) — benching random "
              f"weights", file=sys.stderr)
    jax.block_until_ready(params)
    from psg_tpu.diffusion import dpmpp_2m_sample
    # sample under the TRAINING schedule when the trained checkpoint loads
    # (its sidecar records it; serving's --schedule auto does the same)
    kind, ptype = "linear", "eps"
    if weights == "trained":
        import json as _json
        try:
            _meta = _json.loads(
                Path(diff_ck).with_suffix(".json").read_text())["config"]
            kind = _meta["model"]["beta_schedule"]
            ptype = str(_meta.get("extra", {}).get("prediction_type", "eps"))
        except Exception:
            pass
    schedule = make_schedule(1000, 1e-4, 0.02, kind)

    def chain(p, ids, mask, rng, *, sampler: str, stride: int = 20):
        emb = text_encoder_apply(p["text"], ids, mask, bert_cfg,
                                 dtype=jnp.bfloat16)

        def denoise(x, t):
            out = unet_apply(p["unet"], x.astype(emb.dtype), t, emb, spec,
                             text_mask=mask, dtype=jnp.bfloat16)
            if ptype == "v":  # v-trained checkpoints (sidecar-recorded)
                out = schedule.eps_from_v(out, x, t)
            return out

        b = ids.shape[0]
        if sampler == "dpmpp_cfg":
            # full quality recipe: CFG branches fused in one batch-2N call
            # (generator.py does the same), guidance 2.0 vs a zero negative
            g = 2.0
            emb_cat = jnp.concatenate([emb, jnp.zeros_like(emb)], axis=0)
            mask_cat = jnp.concatenate([mask, mask], axis=0)

            def guided(x, t):
                xx = jnp.concatenate([x, x])
                tt = jnp.concatenate([t, t])
                eps = unet_apply(p["unet"], xx.astype(emb.dtype), tt,
                                 emb_cat, spec,
                                 text_mask=mask_cat, dtype=jnp.bfloat16)
                if ptype == "v":
                    eps = schedule.eps_from_v(eps, xx, tt)
                e_c, e_u = jnp.split(eps.astype(jnp.float32), 2, axis=0)
                return (1.0 + g) * e_c - g * e_u

            latents = dpmpp_2m_sample(guided, schedule, rng,
                                      shape=(b, latent_size, latent_size, 8),
                                      num_inference_steps=10, clip_x0=3.0)
        elif sampler == "dpmpp":
            # quality chain: 2nd-order solver needs ~10 evals for the
            # 50-eval first-order chain's quality (tests/test_diffusion.py)
            latents = dpmpp_2m_sample(denoise, schedule, rng,
                                      shape=(b, latent_size, latent_size, 8),
                                      num_inference_steps=10, clip_x0=3.0)
        else:
            latents = ddpm_sample_fast(denoise, schedule, rng,
                                       shape=(b, latent_size, latent_size, 8), stride=stride)
        return vae_decode(p["vae"], latents.astype(emb.dtype), emb,
                          text_bias=text_bias_from_mask(mask),
                          image_size=image_size, dtype=jnp.bfloat16)

    return {"params": params, "chain": jax.jit(
                chain, static_argnames=("sampler", "stride")),
            "weights": weights, "checkpoints": ckpt_info, "schedule": kind,
            "smoke": smoke}


def _time_chain(setup, sampler: str, batch: int, stride: int = 20,
                reps: int = 3) -> float:
    """Mean seconds per serving batch, compile excluded, PRNG varied per
    rep (identical inputs dedup through the tunnel — see skills/verify)."""
    import jax
    import jax.numpy as jnp

    ids = jnp.ones((batch, 128), jnp.int32)
    mask = jnp.ones((batch, 128), jnp.int32)
    out = setup["chain"](setup["params"], ids, mask, jax.random.PRNGKey(1),
                         sampler=sampler, stride=stride)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(reps):
        out = setup["chain"](setup["params"], ids, mask,
                             jax.random.PRNGKey(2 + i), sampler=sampler,
                             stride=stride)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def quality_recipe_row(setup, batch: int = 8) -> dict:
    """The serving recipe a user actually experiences (VERDICT r3 #7):
    CFG branches fused in one batch-2N UNet call + DPM-Solver++(2M)@10
    on the best TRAINED checkpoint pair, text encode -> denoise -> VAE
    decode.  One dict: sprites/min + per-sprite latency."""
    dt = _time_chain(setup, "dpmpp_cfg", batch)
    return {"recipe": "cfg-fused(g=2.0,zero-neg) + dpmpp@10 + x0-clip",
            "batch": batch,
            "sprites_per_min": round(batch * 60.0 / dt, 1),
            "seconds_per_sprite": round(dt / batch, 3),
            "seconds_per_batch": round(dt, 3),
            "weights": setup["weights"],
            "checkpoints": setup["checkpoints"],
            "schedule": setup["schedule"]}


def serve_bench(steps: int = 50) -> int:
    """`python bench.py serve [steps]` — end-to-end batched serving
    throughput (text encode -> sampler chain -> VAE decode) at batch 8
    and 64 on one chip, best trained checkpoints when present (random
    fallback is visible).  BASELINE config 5's serving-scale row."""
    import jax

    setup = _serving_setup()
    stride = max(1, 1000 // steps)
    rows = {}
    for sampler in ("fast", "dpmpp", "dpmpp_cfg"):
        srows = {}
        for batch in (8, 64):
            dt = _time_chain(setup, sampler, batch, stride=stride)
            srows[batch] = {"seconds_per_batch": round(dt, 3),
                            "sprites_per_min": round(batch * 60.0 / dt, 1)}
        rows[sampler] = srows

    print(json.dumps({
        "metric": "serving_sprites_per_min_per_chip",
        "value": rows["dpmpp"][64]["sprites_per_min"],
        "unit": "sprites/min",
        "vs_baseline": None,
        "detail": {"headline": "dpmpp@10 (quality ~= 50-eval first-order)",
                   "steps": steps, "unet_evals": 1000 // stride,
                   "by_sampler": rows, "weights": setup["weights"],
                   "checkpoints": setup["checkpoints"],
                   "schedule": setup["schedule"],
                   "backend": jax.default_backend(),
                   "device": str(jax.devices()[0])},
    }))
    return 0


def train_bench(batch: int = 4, steps: int = 20) -> int:
    """`python bench.py train [batch]` — stage-2 UNet train-step throughput
    (fwd+bwd+AdamW on the full 655M UNet, synthetic latents/text)."""
    import jax
    import jax.numpy as jnp
    import optax

    from psg_tpu.diffusion import make_schedule
    from psg_tpu.models.losses import smooth_l1_loss
    from psg_tpu.models.unet import UNetSpec, unet_apply, unet_init

    spec = UNetSpec(text_dim=768, num_heads=4)
    params = jax.jit(lambda k: unet_init(k, spec))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    schedule = make_schedule(1000, 1e-4, 0.02, "cosine")
    tx = optax.adamw(1e-4, eps=1e-6)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, latent, text, mask, rng):
        k_t, k_n = jax.random.split(rng)
        t = jax.random.randint(k_t, (latent.shape[0],), 0, 1000)
        noise = jax.random.normal(k_n, latent.shape)
        noisy = schedule.add_noise(latent, noise, t)

        def loss_fn(p):
            pred = unet_apply(p, noisy.astype(jnp.float32), t, text, spec,
                              text_mask=mask, dtype=jnp.bfloat16)
            return smooth_l1_loss(pred, noise, beta=0.1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(1)
    latent = jax.random.normal(key, (batch, 27, 27, 8))
    text = jax.random.normal(key, (batch, 128, 768), jnp.bfloat16)
    mask = jnp.ones((batch, 128), jnp.int32)

    params, opt_state, loss = step(params, opt_state, latent, text, mask,
                                   jax.random.PRNGKey(2))
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for i in range(steps):
        params, opt_state, loss = step(params, opt_state, latent, text, mask,
                                       jax.random.PRNGKey(3 + i))
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / steps
    print(json.dumps({
        "metric": "unet_train_steps_per_sec_per_chip",
        "value": round(1.0 / dt, 2),
        "unit": "steps/s",
        "vs_baseline": None,
        "detail": {"batch": batch, "samples_per_sec": round(batch / dt, 2),
                   "loss": float(loss), "backend": jax.default_backend()},
    }))
    return 0


def main() -> int:
    from psg_tpu.core.config import Config, configure_jax

    configure_jax(Config())  # persistent compile cache (device stays tpu)
    _require_backend()

    import jax
    import jax.numpy as jnp

    from psg_tpu.diffusion import make_schedule
    from psg_tpu.models.unet import UNetSpec, unet_apply, unet_init
    from psg_tpu.diffusion.sampling import ddpm_sample

    if len(sys.argv) > 1 and sys.argv[1] == "train":
        return train_bench(int(sys.argv[2]) if len(sys.argv) > 2 else 4)
    if len(sys.argv) > 1 and sys.argv[1] == "serve":
        return serve_bench(int(sys.argv[2]) if len(sys.argv) > 2 else 50)

    # default: sweep batches 4/8/16 (VERDICT r2 #6 — the batch-4 headline
    # sits at the compute/bandwidth crossover; the sweep puts the chip's
    # real ceiling on record).  `python bench.py B` pins one batch.
    batches = [int(sys.argv[1])] if len(sys.argv) > 1 else [4, 8, 16]
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    spec = UNetSpec(text_dim=768, num_heads=4)
    key = jax.random.PRNGKey(0)
    # one compiled program for the whole 655M-param init (op-by-op init
    # would pay per-op compile latency hundreds of times); weights stored
    # bf16 for serving — re-reading fp32 masters would double the
    # HBM-bound weight traffic (1.3GB vs 2.6GB per denoise step)
    params = jax.jit(
        lambda k: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), unet_init(k, spec))
    )(key)
    jax.block_until_ready(params)
    schedule = make_schedule(1000, 1e-4, 0.02, "cosine")
    device = str(jax.devices()[0])
    peak = _peak_tflops(device)

    def measure(batch):
        text_emb = jax.random.normal(key, (batch, 128, 768), jnp.float32)
        text_mask = jnp.ones((batch, 128), jnp.int32)
        shape = (batch, 27, 27, 8)

        # params/text are jit ARGUMENTS (closing over them would bake
        # 2.6GB of weights into the executable as constants)
        @jax.jit
        def run_chain(p, emb, mask, rng):
            def denoise(x, t):
                return unet_apply(p, x, t, emb, spec, text_mask=mask,
                                  dtype=jnp.bfloat16)

            return ddpm_sample(denoise, schedule, rng, shape=shape,
                               num_timesteps=n_steps)

        # warmup/compile; keep the executable for its XLA FLOP count (MFU)
        example = (params, text_emb, text_mask, jax.random.PRNGKey(1))
        compiled = run_chain.lower(*example).compile()
        chain_flops = _flops_of(compiled)
        out = run_chain(*example)
        out.block_until_ready()

        t0 = time.perf_counter()
        reps = 3
        for i in range(reps):
            out = run_chain(params, text_emb, text_mask,
                            jax.random.PRNGKey(2 + i))
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / reps

        steps_per_sec = n_steps / dt
        # roofline: XLA's own FLOP count vs the chip's bf16 peak.  NOTE:
        # XLA cost analysis counts a scan/while body ONCE, so chain_flops
        # is the PER-STEP figure (cross-checked against
        # scripts/profile_denoise.py's unscanned forward: 320 GFLOP @ b4).
        per_step_dt = dt / n_steps
        achieved = chain_flops / per_step_dt / 1e12 if chain_flops else None
        return {
            "steps_per_sec": round(steps_per_sec, 2),
            "seconds_per_chain": round(dt, 3),
            "sprites_per_min_at_1000_steps": round(
                batch * 60.0 / (1000.0 / steps_per_sec), 2),
            "gflop_per_step": round(chain_flops / 1e9, 1)
            if chain_flops else None,
            "achieved_tflops": round(achieved, 1) if achieved else None,
            "mfu": round(achieved / peak, 4) if achieved and peak else None,
        }

    rows = {b: measure(b) for b in batches}
    headline_batch = batches[0]
    headline = rows[headline_batch]

    # the number a user of this framework actually experiences (VERDICT r3
    # #7): full quality recipe on the best trained checkpoint pair.  Kept
    # non-fatal — a box with no checkpoints still reports the raw sweep.
    # Round 5 additions (VERDICT r4 #1/#7): the BASELINE north-star row —
    # text encode -> FULL 1000-step DDPM chain -> VAE decode wall time —
    # and the batch-64 serving-scale quality row (BASELINE config 5), so
    # both land in BENCH_r*.json every round instead of only via
    # `bench.py serve`.
    end_to_end = {}
    serve_scale = {}
    if os.environ.get("PSG_TPU_BENCH_RAW"):
        # perf-harness mode: just the raw denoise sweep (each serving row
        # costs a multi-minute compile; A/B loops only need steps/s)
        print(json.dumps({
            "metric": "unet_denoise_steps_per_sec_per_chip",
            "value": headline["steps_per_sec"],
            "unit": "steps/s",
            "vs_baseline": round(headline["steps_per_sec"]
                                 / BASELINE_STEPS_PER_SEC, 3),
            "detail": {"batch": headline_batch, "chain_steps": n_steps,
                       "by_batch": rows, "raw": True,
                       "env": {k: v for k, v in os.environ.items()
                               if k.startswith("PSG_TPU_")},
                       "backend": jax.default_backend(), "device": device},
        }))
        return 0
    try:
        setup = _serving_setup()
        quality = quality_recipe_row(setup)
        for b in (1, 8):
            dt = _time_chain(setup, "fast", b, stride=1)
            end_to_end[b] = {
                "seconds_per_batch": round(dt, 3),
                "seconds_per_sprite": round(dt / b, 3),
                "vs_5s_target": round(5.0 / (dt / b), 2),
            }
        serve_scale = quality_recipe_row(setup, batch=64)
    except Exception as e:  # noqa: BLE001
        quality = {"error": f"{type(e).__name__}: {e}"}

    print(json.dumps({
        "metric": "unet_denoise_steps_per_sec_per_chip",
        "value": headline["steps_per_sec"],
        "unit": "steps/s",
        "vs_baseline": round(headline["steps_per_sec"]
                             / BASELINE_STEPS_PER_SEC, 3),
        "detail": {
            "batch": headline_batch,
            "chain_steps": n_steps,
            "by_batch": rows,
            "serving_quality_recipe": quality,
            "end_to_end_1000step": end_to_end,
            "serving_scale_batch64": serve_scale,
            "backend": jax.default_backend(),
            "device": device,
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
