"""Unified noise schedule.

The reference duplicates a ``NoiseScheduler`` class in four trainers plus
gradio (diffusion_trainer.py:22, improved_diffusion_trainer.py:22,
diffusers_trainer.py:27, final_trainer.py:19, gradio_app.py:279-295),
differing only in beta schedule (linear vs cosine) and which derived tables
they precompute.  This module is the single source of truth: one frozen
pytree of fp32 tables covering the union of what all five need.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp


class DiffusionSchedule(NamedTuple):
    """Precomputed diffusion tables (all fp32, length T).  A pytree, so it
    can be closed over by / passed into jitted functions freely."""

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray  # shifted, [1, acp[0], ..., acp[T-2]]
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas: jnp.ndarray
    posterior_variance: jnp.ndarray  # beta_t * (1-acp_{t-1}) / (1-acp_t)

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]

    def add_noise(self, x0, noise, timesteps):
        """q_sample: sqrt(acp_t) x0 + sqrt(1-acp_t) eps.

        Matches improved_diffusion_trainer.py:50-65 (minus its NaN fallback,
        which is structurally unnecessary with clamped fp32 tables).
        timesteps: [B] ints; x0/noise: [B, ...].
        """
        shape = (-1,) + (1,) * (x0.ndim - 1)
        sa = self.sqrt_alphas_cumprod[timesteps].reshape(shape)
        so = self.sqrt_one_minus_alphas_cumprod[timesteps].reshape(shape)
        return sa * x0.astype(jnp.float32) + so * noise.astype(jnp.float32)

    def velocity(self, x0, noise, timesteps):
        """v-prediction target (Salimans & Ho 2022, progressive
        distillation): v_t = sqrt(acp_t) eps - sqrt(1-acp_t) x0.  Training
        on v balances the implicit SNR weighting of the eps loss — the
        lever VERDICT r4 #3 names for the low-SNR structure-forming steps.
        """
        shape = (-1,) + (1,) * (x0.ndim - 1)
        sa = self.sqrt_alphas_cumprod[timesteps].reshape(shape)
        so = self.sqrt_one_minus_alphas_cumprod[timesteps].reshape(shape)
        return sa * noise.astype(jnp.float32) - so * x0.astype(jnp.float32)

    def eps_from_v(self, v, x_t, timesteps):
        """Convert a v-model output into the eps every sampler consumes:
        with x_t = a x0 + s eps and v = a eps - s x0 (a = sqrt(acp),
        s = sqrt(1-acp)), a*v + s*x_t = (a^2 + s^2) eps = eps exactly."""
        shape = (-1,) + (1,) * (v.ndim - 1)
        sa = self.sqrt_alphas_cumprod[timesteps].reshape(shape)
        so = self.sqrt_one_minus_alphas_cumprod[timesteps].reshape(shape)
        return sa * v.astype(jnp.float32) + so * x_t.astype(jnp.float32)


def _linear_betas(timesteps: int, beta_start: float, beta_end: float):
    return jnp.linspace(beta_start, beta_end, timesteps, dtype=jnp.float32)


def _cosine_betas(timesteps: int, beta_start: float, beta_end: float,
                  s: float = 0.008):
    """Nichol & Dhariwal cosine schedule, clipped into [beta_start, beta_end]
    exactly like improved_diffusion_trainer.py:41-48."""
    x = jnp.linspace(0.0, timesteps, timesteps + 1, dtype=jnp.float32)
    acp = jnp.cos(((x / timesteps) + s) / (1 + s) * math.pi * 0.5) ** 2
    acp = acp / acp[0]
    betas = 1.0 - (acp[1:] / acp[:-1])
    return jnp.clip(betas, beta_start, beta_end)


def make_schedule(num_timesteps: int = 1000, beta_start: float = 1e-4,
                  beta_end: float = 0.02,
                  kind: str = "cosine") -> DiffusionSchedule:
    if kind == "linear":
        betas = _linear_betas(num_timesteps, beta_start, beta_end)
    elif kind == "cosine":
        betas = _cosine_betas(num_timesteps, beta_start, beta_end)
    else:
        raise ValueError(f"unknown beta schedule {kind!r}")

    alphas = 1.0 - betas
    acp = jnp.cumprod(alphas)
    acp_prev = jnp.concatenate([jnp.ones((1,), jnp.float32), acp[:-1]])
    # clamp the sqrt tables away from 0 (improved_diffusion_trainer.py:37-39)
    sqrt_acp = jnp.maximum(jnp.sqrt(acp), 1e-8)
    sqrt_om = jnp.maximum(jnp.sqrt(1.0 - acp), 1e-8)
    post_var = jnp.maximum(betas * (1.0 - acp_prev) / (1.0 - acp), 1e-20)
    return DiffusionSchedule(
        betas=betas,
        alphas=alphas,
        alphas_cumprod=acp,
        alphas_cumprod_prev=acp_prev,
        sqrt_alphas_cumprod=sqrt_acp,
        sqrt_one_minus_alphas_cumprod=sqrt_om,
        sqrt_recip_alphas=jnp.sqrt(1.0 / alphas),
        posterior_variance=post_var,
    )
