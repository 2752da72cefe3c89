"""Diffusion schedule + sampler tests, pinned against the reference math."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psg_tpu.diffusion import (
    ddim_sample,
    ddpm_sample,
    ddpm_sample_fast,
    ddpm_sample_renoise,
    dpmpp_2m_sample,
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


def _gaussian_optimal_denoise(sched, data_std: float):
    """The exact Bayes-optimal eps predictor for x0 ~ N(0, data_std^2 I):
    E[eps | x_t] = sqrt(1-acp_t) x_t / (acp_t s^2 + 1 - acp_t).  A sampler
    that implements the reverse chain correctly must map the prior to
    (approximately) N(0, data_std^2) when driven by this denoiser."""
    acp = sched.alphas_cumprod
    s2 = data_std * data_std

    def denoise(x, t):
        a = acp[t].reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.sqrt(1.0 - a) * x / (a * s2 + (1.0 - a))

    return denoise


_DIST_SHAPE = (512, 4, 4, 3)


@pytest.mark.parametrize("steps", [20, 50])
def test_ddim_strided_preserves_data_variance(steps):
    """The property that makes DDIM the framework's quality sampler: driven
    by the Bayes-optimal denoiser for N(0, 2^2) data, a *strided* DDIM chain
    still lands on the data distribution (std ~= 2).  The reference's strided
    samplers cannot — contrast case below.  Measured here: ddim@50 -> 1.94,
    ddim@20 -> 1.86, fast@50 -> 1.03, renoise@50 -> 0.94."""
    sched = make_schedule(1000, 1e-4, 0.02, "cosine")
    denoise = _gaussian_optimal_denoise(sched, 2.0)
    out = ddim_sample(denoise, sched, jax.random.PRNGKey(8),
                      shape=_DIST_SHAPE, num_inference_steps=steps, eta=0.0)
    assert 1.7 < float(jnp.std(out)) < 2.2


def test_reference_strided_samplers_stay_at_prior_variance():
    """Contrast case: the reference's strided samplers repeat SINGLE-step
    posterior updates at visited timesteps, each removing only a
    1/T-schedule's worth of noise, so from a prior draw they never reach the
    data distribution (std stays ~1 instead of 2) — the documented reason
    the epoch-grid/serving default moved to DDIM."""
    sched = make_schedule(1000, 1e-4, 0.02, "cosine")
    denoise = _gaussian_optimal_denoise(sched, 2.0)
    fast = ddpm_sample_fast(denoise, sched, jax.random.PRNGKey(8),
                            shape=_DIST_SHAPE, stride=50)
    assert float(jnp.std(fast)) < 1.3
    ren = ddpm_sample_renoise(denoise, sched, jax.random.PRNGKey(8),
                              shape=_DIST_SHAPE, num_inference_steps=50)
    assert float(jnp.std(ren)) < 1.3


@pytest.mark.parametrize("steps", [10, 25])
def test_dpmpp_2m_preserves_data_variance_at_few_steps(steps):
    """DPM-Solver++(2M) is the few-step quality sampler: its 2nd-order
    lambda-space extrapolation hits the data distribution at 10 evals where
    DDIM needs 50+ (measured: dpmpp@10 -> 1.999, ddim@10 -> 1.73,
    ddim@50 -> 1.94 for N(0, 2^2) data)."""
    sched = make_schedule(1000, 1e-4, 0.02, "cosine")
    denoise = _gaussian_optimal_denoise(sched, 2.0)
    out = dpmpp_2m_sample(denoise, sched, jax.random.PRNGKey(8),
                          shape=_DIST_SHAPE, num_inference_steps=steps)
    assert bool(jnp.all(jnp.isfinite(out)))
    assert 1.9 < float(jnp.std(out)) < 2.1


def test_dpmpp_2m_deterministic_clip_and_cfg():
    sched = make_schedule(100, 1e-4, 0.02, "cosine")
    key = jax.random.PRNGKey(9)
    a = dpmpp_2m_sample(_zero_denoise, sched, key, shape=SHAPE,
                        num_inference_steps=10)
    b = dpmpp_2m_sample(_zero_denoise, sched, key, shape=SHAPE,
                        num_inference_steps=10)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def big_denoise(x, t):
        return -5.0 * jnp.ones_like(x)

    out = dpmpp_2m_sample(big_denoise, sched, jax.random.PRNGKey(10),
                          shape=SHAPE, num_inference_steps=20, clip_x0=3.0)
    assert float(jnp.max(out)) <= 3.0 + 1e-5

    def eps_c(x, t):
        return 0.1 * x

    def eps_u(x, t):
        return -0.1 * x

    base = dpmpp_2m_sample(eps_c, sched, key, shape=SHAPE,
                           num_inference_steps=10)
    guided = dpmpp_2m_sample(eps_c, sched, key, shape=SHAPE,
                             num_inference_steps=10, guidance_scale=2.0,
                             uncond_denoise_fn=eps_u)
    same = dpmpp_2m_sample(eps_c, sched, key, shape=SHAPE,
                           num_inference_steps=10, guidance_scale=2.0,
                           uncond_denoise_fn=eps_c)
    np.testing.assert_allclose(np.asarray(same), np.asarray(base), rtol=1e-5)
    assert float(jnp.mean(jnp.abs(guided - base))) > 1e-4


def test_ddim_eta0_deterministic_and_finite():
    sched = make_schedule(100, 1e-4, 0.02, "cosine")
    key = jax.random.PRNGKey(9)
    a = ddim_sample(_zero_denoise, sched, key, shape=SHAPE,
                    num_inference_steps=10)
    b = ddim_sample(_zero_denoise, sched, key, shape=SHAPE,
                    num_inference_steps=10)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert bool(jnp.all(jnp.isfinite(a)))
    # eta>0 injects noise -> differs from eta=0
    c = ddim_sample(_zero_denoise, sched, key, shape=SHAPE,
                    num_inference_steps=10, eta=1.0)
    assert float(jnp.max(jnp.abs(a - c))) > 1e-4


def test_ddim_clip_x0_bounds_output():
    sched = make_schedule(50, 1e-4, 0.02, "linear")

    def big_denoise(x, t):
        return -5.0 * jnp.ones_like(x)  # drives x0_hat far positive

    out = ddim_sample(big_denoise, sched, jax.random.PRNGKey(10), shape=SHAPE,
                      num_inference_steps=50, eta=0.0, clip_x0=3.0)
    assert float(jnp.max(out)) <= 3.0 + 1e-5


def test_ddim_cfg_interpolates_branches():
    """guidance 0 == conditional branch; guidance>0 moves away from the
    unconditional branch along (eps_c - eps_u)."""
    sched = make_schedule(50, 1e-4, 0.02, "cosine")
    key = jax.random.PRNGKey(11)

    def eps_c(x, t):
        return 0.1 * x

    def eps_u(x, t):
        return -0.1 * x

    base = ddim_sample(eps_c, sched, key, shape=SHAPE, num_inference_steps=10)
    guided = ddim_sample(eps_c, sched, key, shape=SHAPE,
                         num_inference_steps=10, guidance_scale=2.0,
                         uncond_denoise_fn=eps_u)
    same = ddim_sample(eps_c, sched, key, shape=SHAPE,
                       num_inference_steps=10, guidance_scale=2.0,
                       uncond_denoise_fn=eps_c)
    np.testing.assert_allclose(np.asarray(same), np.asarray(base), rtol=1e-5)
    assert float(jnp.mean(jnp.abs(guided - base))) > 1e-4


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


def test_v_parameterization_identities():
    """v = sqrt(acp) eps - sqrt(1-acp) x0, and eps_from_v inverts it
    EXACTLY given x_t: a*v + s*x_t = (a^2+s^2) eps = eps."""
    sched = make_schedule(50, 1e-4, 0.02, "cosine")
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    x0 = jax.random.normal(k1, (4, 5, 5, 2))
    eps = jax.random.normal(k2, (4, 5, 5, 2))
    t = jnp.array([0, 10, 25, 49])
    x_t = sched.add_noise(x0, eps, t)
    v = sched.velocity(x0, eps, t)
    np.testing.assert_allclose(np.asarray(sched.eps_from_v(v, x_t, t)),
                               np.asarray(eps), rtol=2e-5, atol=2e-5)
    # and the x0 recovered from the converted eps matches
    a = sched.sqrt_alphas_cumprod[t].reshape(-1, 1, 1, 1)
    s = sched.sqrt_one_minus_alphas_cumprod[t].reshape(-1, 1, 1, 1)
    np.testing.assert_allclose(
        np.asarray((x_t - s * sched.eps_from_v(v, x_t, t)) / a),
        np.asarray(x0), rtol=2e-4, atol=2e-4)
