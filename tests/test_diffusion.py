"""Diffusion schedule + sampler tests, pinned against the reference math."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psg_tpu.diffusion import (
    ddpm_sample,
    ddpm_sample_fast,
    ddpm_sample_renoise,
    ddpm_sample_x0,
    make_schedule,
)


def _reference_cosine_betas(T, beta_start, beta_end, s=0.008):
    """Numpy transcription of improved_diffusion_trainer.py:41-48."""
    x = np.linspace(0, T, T + 1, dtype=np.float32)
    acp = np.cos(((x / T) + s) / (1 + s) * math.pi * 0.5) ** 2
    acp = acp / acp[0]
    betas = 1 - (acp[1:] / acp[:-1])
    return np.clip(betas, beta_start, beta_end)


def test_cosine_schedule_matches_reference():
    sched = make_schedule(1000, 1e-4, 0.02, "cosine")
    ref = _reference_cosine_betas(1000, 1e-4, 0.02)
    np.testing.assert_allclose(np.asarray(sched.betas), ref, rtol=2e-3, atol=1e-5)


def test_linear_schedule_matches_reference():
    sched = make_schedule(1000, 1e-4, 0.02, "linear")
    ref = np.linspace(1e-4, 0.02, 1000, dtype=np.float32)
    np.testing.assert_allclose(np.asarray(sched.betas), ref, rtol=1e-6)
    # derived tables
    np.testing.assert_allclose(
        np.asarray(sched.alphas_cumprod), np.cumprod(1 - ref), rtol=1e-5
    )


def test_posterior_variance_formula():
    sched = make_schedule(100, 1e-4, 0.02, "linear")
    acp = np.asarray(sched.alphas_cumprod)
    acp_prev = np.concatenate([[1.0], acp[:-1]])
    betas = np.asarray(sched.betas)
    expected = np.maximum(betas * (1 - acp_prev) / (1 - acp), 1e-20)
    np.testing.assert_allclose(np.asarray(sched.posterior_variance), expected, rtol=1e-5)


def test_add_noise_endpoints():
    sched = make_schedule(1000, 1e-4, 0.02, "cosine")
    x0 = jnp.ones((2, 4, 4, 1))
    noise = jnp.zeros_like(x0) + 0.5
    # t=0: mostly signal
    noisy0 = sched.add_noise(x0, noise, jnp.array([0, 0]))
    assert float(jnp.mean(jnp.abs(noisy0 - x0))) < 0.1
    # t=T-1: mostly noise
    noisyT = sched.add_noise(x0, noise, jnp.array([999, 999]))
    assert float(jnp.abs(jnp.mean(noisyT) - 0.5)) < 0.2


SHAPE = (2, 8, 8, 4)


def _zero_denoise(x, t):
    return jnp.zeros_like(x)


@pytest.mark.parametrize("sampler,kwargs", [
    (ddpm_sample, dict(num_timesteps=20)),
    (ddpm_sample_fast, dict(stride=5)),
    (ddpm_sample_x0, dict(num_inference_steps=10)),
    (ddpm_sample_renoise, dict(num_inference_steps=10)),
])
def test_samplers_run_and_produce_finite(sampler, kwargs):
    sched = make_schedule(100, 1e-4, 0.02, "cosine")
    key = jax.random.PRNGKey(0)
    out = jax.jit(
        lambda k: sampler(_zero_denoise, sched, k, shape=SHAPE, **kwargs)
    )(key)
    assert out.shape == SHAPE
    assert bool(jnp.all(jnp.isfinite(out)))


def test_sampler_seeded_determinism():
    sched = make_schedule(50, 1e-4, 0.02, "linear")
    key = jax.random.PRNGKey(3)
    a = ddpm_sample(_zero_denoise, sched, key, shape=SHAPE)
    b = ddpm_sample(_zero_denoise, sched, key, shape=SHAPE)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = ddpm_sample(_zero_denoise, sched, jax.random.PRNGKey(4), shape=SHAPE)
    assert float(jnp.max(jnp.abs(a - c))) > 1e-3


def test_more_steps_changes_output():
    """Analog of the reference's 'diffusion is actually running' probe
    (tests/test_diffusion_generation.py:45-68): different step counts give
    different outputs."""
    sched = make_schedule(100, 1e-4, 0.02, "cosine")
    key = jax.random.PRNGKey(5)

    def denoise(x, t):
        return 0.1 * x

    out10 = ddpm_sample_renoise(denoise, sched, key, shape=SHAPE, num_inference_steps=10)
    out50 = ddpm_sample_renoise(denoise, sched, key, shape=SHAPE, num_inference_steps=50)
    assert float(jnp.mean(jnp.abs(out10 - out50))) > 1e-3


def test_initial_latent_is_respected():
    sched = make_schedule(10, 1e-4, 0.02, "linear")
    key = jax.random.PRNGKey(6)
    init = jnp.full(SHAPE, 3.0)
    # with a zero-noise denoiser and deterministic path the init must matter
    a = ddpm_sample_renoise(_zero_denoise, sched, key, initial_latent=init,
                            num_inference_steps=5)
    b = ddpm_sample_renoise(_zero_denoise, sched, key, shape=SHAPE,
                            num_inference_steps=5)
    assert float(jnp.max(jnp.abs(a - b))) > 1e-3
