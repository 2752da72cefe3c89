"""Sampler transcription parity: the lax.scan samplers must compute exactly
what a step-by-step Python loop over the reference equations computes
(same PRNG stream), pinning the scan bodies against the reference math
(final_trainer.py:52-71, improved_diffusion_trainer.py:508-569,
gradio_app.py:297-361)."""

import jax
import jax.numpy as jnp
import numpy as np

from psg_tpu.diffusion import (
    ddpm_sample,
    ddpm_sample_fast,
    ddpm_sample_renoise,
    make_schedule,
)

SHAPE = (2, 4, 4, 3)


def _denoise(x, t):
    # deterministic pseudo-model: time-dependent contraction
    return 0.05 * x + 0.01 * t[:, None, None, None].astype(jnp.float32)


def test_ddpm_sample_matches_python_loop():
    T = 12
    sched = make_schedule(T, 1e-4, 0.02, "linear")
    key = jax.random.PRNGKey(0)

    out = ddpm_sample(_denoise, sched, key, shape=SHAPE)

    # python transcription with the identical PRNG stream
    key2, kinit = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kinit, SHAPE, jnp.float32)
    k = key2
    for t in range(T - 1, -1, -1):
        k, kn = jax.random.split(k)
        eps = _denoise(x, jnp.full((SHAPE[0],), t, jnp.int32))
        noise = jax.random.normal(kn, x.shape, jnp.float32)
        if t > 0:
            sra = sched.sqrt_recip_alphas[t]
            coeff = sched.betas[t] / sched.sqrt_one_minus_alphas_cumprod[t]
            mean = sra * (x - coeff * eps)  # final_trainer.py:63-65
            sigma = jnp.sqrt(sched.posterior_variance[t])  # :67-70
            x = mean + sigma * noise
        else:
            x = x - eps  # final_trainer.py:202-204

    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-5,
                               atol=1e-6)


def test_ddpm_sample_fast_matches_python_loop():
    T = 20
    stride = 5
    sched = make_schedule(T, 1e-4, 0.02, "cosine")
    key = jax.random.PRNGKey(1)

    out = ddpm_sample_fast(_denoise, sched, key, shape=SHAPE, stride=stride)

    key2, kinit = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kinit, SHAPE, jnp.float32)
    k = key2
    for t in range(T - (T - 1) % stride - 1, -1, -stride):
        k, kn = jax.random.split(k)
        eps = _denoise(x, jnp.full((SHAPE[0],), t, jnp.int32))
        c1 = 1.0 / jnp.sqrt(sched.alphas[t])
        c2 = sched.betas[t] / sched.sqrt_one_minus_alphas_cumprod[t]
        x = c1 * (x - c2 * eps)  # improved_diffusion_trainer.py:556-560
        noise = jax.random.normal(kn, x.shape, jnp.float32)
        if t > 0:  # renoise with sqrt(beta) (:561-567)
            x = x + jnp.sqrt(sched.betas[t]) * noise

    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-5,
                               atol=1e-6)


def test_renoise_sampler_matches_python_loop():
    T = 40
    steps = 7
    sched = make_schedule(T, 1e-4, 0.02, "linear")
    key = jax.random.PRNGKey(2)

    out = ddpm_sample_renoise(_denoise, sched, key, shape=SHAPE,
                              num_inference_steps=steps)

    key2, kinit = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(kinit, SHAPE, jnp.float32)
    k = key2
    ts = np.asarray(jnp.linspace(T - 1, 0, steps).astype(jnp.int32))
    for i, t in enumerate(ts):
        k, kn = jax.random.split(k)
        eps = _denoise(x, jnp.full((SHAPE[0],), int(t), jnp.int32))
        # gradio_app.py:344-358
        denoised = (x - (1 - sched.alphas[t]) /
                    sched.sqrt_one_minus_alphas_cumprod[t] * eps) / jnp.sqrt(
                        sched.alphas[t])
        noise = jax.random.normal(kn, x.shape, jnp.float32)
        if i < steps - 1 and ts[i + 1] > 0:
            t_next = ts[i + 1]
            x = (jnp.sqrt(sched.alphas[t_next]) * denoised
                 + jnp.sqrt(1 - sched.alphas[t_next]) * noise)
        else:
            x = denoised

    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-5,
                               atol=1e-6)
