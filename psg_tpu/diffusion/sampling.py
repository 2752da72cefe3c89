"""DDPM sampler family, fully on-device as ``lax.scan`` loops.

The reference runs Python ``for`` loops over timesteps with per-step host
syncs (``.item()``, improved_diffusion_trainer.py:508-569); here every
sampler is one jitted scan over precomputed per-step tables, so the whole
1000-step chain stays on-chip (this is where the >=200 steps/s/chip target
comes from, BASELINE.json).

Four variants, matching the reference's sampler zoo (SURVEY.md §2.2/§3.4):

- ``ddpm_sample``          canonical posterior-variance DDPM
                           (final_trainer.py:52-71) — the default.
- ``ddpm_sample_fast``     strided every-``stride``-th timestep with
                           sqrt(beta) renoise (improved_diffusion_trainer.py:508-569).
- ``ddpm_sample_x0``       x0-prediction form with posterior variance
                           (diffusers_trainer.py:76-100).
- ``ddpm_sample_renoise``  the gradio variant: denoise fully, then renoise
                           toward the next step's single-step alpha
                           (gradio_app.py:297-361).

All take ``denoise_fn(x_t, t_batch) -> eps_hat`` (a closure over the UNet
params + text conditioning), a ``DiffusionSchedule``, a PRNG key, and either
an initial latent or a shape to draw from N(0, I).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from psg_tpu.diffusion.schedule import DiffusionSchedule


def _init_latent(key, shape, initial_latent):
    if initial_latent is not None:
        return initial_latent.astype(jnp.float32)
    return jax.random.normal(key, shape, jnp.float32)


def ddpm_sample(denoise_fn: Callable, schedule: DiffusionSchedule, key,
                shape=None, initial_latent=None,
                num_timesteps: Optional[int] = None,
                num_inference_steps: Optional[int] = None,
                noises=None):
    """Posterior-variance DDPM, exactly FinalPokemonGenerator.forward
    (final_trainer.py:186-204):

    - timesteps t_i = max(0, T-1 - i*(T//steps)) for i in range(steps);
    - t > 0:  x_{t-1} = 1/sqrt(a_t) (x_t - b_t/sqrt(1-acp_t) eps)
                        + sqrt(postvar_t) z   (sample_previous_timestep,
                        final_trainer.py:52-71)
    - t == 0: x = x - eps                      (final_trainer.py:202-204)

    ``num_timesteps`` is a bench-only alias for num_inference_steps.
    ``noises`` ([steps, *x.shape]) injects the per-step gaussians (parity
    harness); default draws from ``key``.
    """
    T = schedule.num_timesteps
    steps = num_inference_steps or num_timesteps or T
    stride = max(1, T // steps)
    key, kinit = jax.random.split(key)
    x = _init_latent(kinit, shape, initial_latent)
    b = x.shape[0]

    ts = jnp.maximum(T - 1 - jnp.arange(steps) * stride, 0)
    tables = (
        ts,
        schedule.sqrt_recip_alphas[ts],
        schedule.betas[ts] / schedule.sqrt_one_minus_alphas_cumprod[ts],
        jnp.sqrt(schedule.posterior_variance[ts]),
    )
    if noises is not None:
        tables = tables + (noises.astype(jnp.float32),)

    def body(carry, tab):
        x, k = carry
        if noises is not None:
            t, sra, coeff, sigma, noise = tab
        else:
            t, sra, coeff, sigma = tab
            k, kn = jax.random.split(k)
            noise = jax.random.normal(kn, x.shape, jnp.float32)
        eps = denoise_fn(x, jnp.full((b,), t, jnp.int32)).astype(jnp.float32)
        mean = sra * (x - coeff * eps)
        x = jnp.where(t > 0, mean + sigma * noise, x - eps)
        return (x, k), None

    (x, _), _ = lax.scan(body, (x, key), tables)
    return x


def ddpm_sample_fast(denoise_fn: Callable, schedule: DiffusionSchedule, key,
                     shape=None, initial_latent=None, stride: int = 50,
                     renoise: bool = True):
    """Strided sampler from ImprovedDiffusionTrainer.ddpm_sample.

    Visits t = T-stride, ..., stride, 0 (reversed range(0, T, stride)).
    After each denoise update, re-adds sqrt(beta_t) noise for t > 0
    (in the reference's fast mode every visited t satisfies t % stride == 0,
    so renoise fires at every step except t=0).  ``stride=1, renoise=True``
    reproduces the reference's full 1000-step mode.
    """
    T = schedule.num_timesteps
    key, kinit = jax.random.split(key)
    x = _init_latent(kinit, shape, initial_latent)
    b = x.shape[0]

    ts = jnp.arange(T - (T - 1) % stride - 1, -1, -stride)
    tables = (
        ts,
        1.0 / jnp.sqrt(schedule.alphas[ts]),
        schedule.betas[ts] / schedule.sqrt_one_minus_alphas_cumprod[ts],
        jnp.sqrt(schedule.betas[ts]),
    )

    def body(carry, tab):
        x, k = carry
        t, c1, c2, sigma = tab
        k, kn = jax.random.split(k)
        eps = denoise_fn(x, jnp.full((b,), t, jnp.int32)).astype(jnp.float32)
        x = c1 * (x - c2 * eps)
        if renoise:
            noise = jax.random.normal(kn, x.shape, jnp.float32)
            x = x + jnp.where(t > 0, sigma, 0.0) * noise
        return (x, k), None

    (x, _), _ = lax.scan(body, (x, key), tables)
    return x


def ddpm_sample_x0(denoise_fn: Callable, schedule: DiffusionSchedule, key,
                   shape=None, initial_latent=None,
                   num_inference_steps: Optional[int] = None):
    """x0-prediction-form sampler (DiffusersTrainer.sample_prev_timestep).

    x0_hat = (x_t - sqrt(1-acp_t) eps) / sqrt(acp_t)
    x_{t-1} = sqrt(acp_{t-1}) x0_hat + sqrt(1-acp_{t-1}) eps
              + sqrt(postvar_t) z   (t > 0)

    When ``num_inference_steps`` < T, timesteps are strided uniformly like
    FinalPokemonGenerator.forward (final_trainer.py:186-204).
    """
    T = schedule.num_timesteps
    key, kinit = jax.random.split(key)
    x = _init_latent(kinit, shape, initial_latent)
    b = x.shape[0]

    if num_inference_steps is None or num_inference_steps >= T:
        ts = jnp.arange(T - 1, -1, -1)
    else:
        step = T // num_inference_steps
        ts = jnp.arange(T - 1, -1, -step)

    acp = schedule.alphas_cumprod[ts]
    acp_prev = jnp.where(ts > 0, schedule.alphas_cumprod[jnp.maximum(ts - 1, 0)], 1.0)
    tables = (
        ts,
        jnp.sqrt(1.0 - acp),
        1.0 / jnp.sqrt(acp),
        jnp.sqrt(acp_prev),
        jnp.sqrt(1.0 - acp_prev),
        jnp.sqrt(schedule.posterior_variance[ts]),
    )

    def body(carry, tab):
        x, k = carry
        t, s_om, r_acp, s_acp_prev, s_om_prev, sigma = tab
        k, kn = jax.random.split(k)
        eps = denoise_fn(x, jnp.full((b,), t, jnp.int32)).astype(jnp.float32)
        x0_hat = (x - s_om * eps) * r_acp
        x = s_acp_prev * x0_hat + s_om_prev * eps
        noise = jax.random.normal(kn, x.shape, jnp.float32)
        x = x + jnp.where(t > 0, sigma, 0.0) * noise
        return (x, k), None

    (x, _), _ = lax.scan(body, (x, key), tables)
    return x


def ddpm_sample_renoise(denoise_fn: Callable, schedule: DiffusionSchedule, key,
                        shape=None, initial_latent=None,
                        num_inference_steps: int = 50, noises=None):
    """The serving-path sampler (gradio_app.py:297-361).

    timesteps = linspace(T-1, 0, steps); at each step denoise fully with the
    single-step alpha, then (except the last step) re-noise toward the NEXT
    timestep using sqrt(alpha_{t_next}) / sqrt(1 - alpha_{t_next}) —
    a nonstandard but behaviorally pinned variant, kept for serving parity.
    ``noises`` ([steps, *x.shape]) injects the per-step gaussians.
    """
    T = schedule.num_timesteps
    key, kinit = jax.random.split(key)
    x = _init_latent(kinit, shape, initial_latent)
    b = x.shape[0]

    ts = jnp.linspace(T - 1, 0, num_inference_steps).astype(jnp.int32)
    next_ts = jnp.concatenate([ts[1:], jnp.zeros((1,), jnp.int32)])
    n = num_inference_steps
    is_last = jnp.arange(n) == n - 1

    alphas_t = schedule.alphas[ts]
    tables = (
        ts,
        (1.0 - alphas_t) / schedule.sqrt_one_minus_alphas_cumprod[ts],
        1.0 / jnp.sqrt(alphas_t),
        jnp.sqrt(schedule.alphas[next_ts]),
        jnp.sqrt(1.0 - schedule.alphas[next_ts]),
        next_ts,
        is_last,
    )
    if noises is not None:
        tables = tables + (noises.astype(jnp.float32),)

    def body(carry, tab):
        x, k = carry
        if noises is not None:
            t, coeff, r_alpha, s_an, s_oman, t_next, last, noise = tab
        else:
            t, coeff, r_alpha, s_an, s_oman, t_next, last = tab
            k, kn = jax.random.split(k)
            noise = jax.random.normal(kn, x.shape, jnp.float32)
        eps = denoise_fn(x, jnp.full((b,), t, jnp.int32)).astype(jnp.float32)
        denoised = (x - coeff * eps) * r_alpha
        renoised = s_an * denoised + s_oman * noise
        do_renoise = jnp.logical_and(jnp.logical_not(last), t_next > 0)
        x = jnp.where(do_renoise, renoised, denoised)
        return (x, k), None

    (x, _), _ = lax.scan(body, (x, key), tables)
    return x
