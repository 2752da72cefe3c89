"""Loss functions for all three training stages.

Stage 1 (VAE): L1 recon + VGG16 perceptual + mean-normalized KL with
annealing and free bits (reference: src/models/losses.py:95-162,
vae_trainer.py:225-282).
Stage 2 (diffusion): SmoothL1(beta=0.1) on noise prediction
(improved_diffusion_trainer.py:300) and MSE (legacy trainer).
Stage 3: L1 + 0.1*MSE roundtrip + CLIP (final_trainer.py:425-473).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from psg_tpu.models.vgg import vgg16_features
from psg_tpu.nn.resize import bilinear_resize


def _per_sample_mean(x):
    """Mean over all non-batch axes -> shape [B]."""
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def _reduce(elementwise, sample_weights):
    """Full mean, or a sample-weighted mean when ``sample_weights`` [B] is
    given (used by eval to exclude wraparound-padded tail samples so val
    loss is invariant to batch size)."""
    if sample_weights is None:
        return jnp.mean(elementwise)
    w = sample_weights.astype(jnp.float32)
    return jnp.sum(_per_sample_mean(elementwise) * w) / jnp.maximum(
        jnp.sum(w), 1.0)


def l1_loss(pred, target, sample_weights=None):
    d = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    return _reduce(d, sample_weights)


def mse_loss(pred, target, sample_weights=None):
    d = jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32))
    return _reduce(d, sample_weights)


def smooth_l1_loss(pred, target, beta: float = 0.1, sample_weights=None):
    """torch SmoothL1Loss(beta): 0.5 x^2 / beta if |x| < beta else |x| - beta/2."""
    d = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    return _reduce(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta),
                   sample_weights)


def kl_divergence(mu, logvar, sample_weights=None) -> jnp.ndarray:
    """Mean-normalized KL: -0.5 sum(1 + logvar - mu^2 - e^logvar) / numel(mu)
    (losses.py:147-148).  With weights all-ones this equals the weighted
    per-sample form, so eval masking stays consistent with training."""
    mu = mu.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    kl_elem = -0.5 * (1.0 + logvar - jnp.square(mu) - jnp.exp(logvar))
    return _reduce(kl_elem, sample_weights)


def kl_divergence_free_bits(mu, logvar, free_bits: float = 0.1,
                            sample_weights=None) -> jnp.ndarray:
    """Per-dimension KL with a free-bits floor (vae_trainer.py:236-247 — the
    reference defines this helper but its annealing path never calls it; we
    expose it as a first-class option)."""
    mu = mu.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    kl_per_dim = -0.5 * (1.0 + logvar - jnp.square(mu) - jnp.exp(logvar))
    return _reduce(jnp.maximum(kl_per_dim, free_bits), sample_weights)


def kl_anneal_weight(epoch, *, start: int, end: int, w_start: float,
                     w_end: float) -> jnp.ndarray:
    """Linear KL annealing over epochs (vae_trainer.py:225-234)."""
    epoch = jnp.asarray(epoch, jnp.float32)
    t = jnp.clip((epoch - start) / jnp.maximum(end - start, 1), 0.0, 1.0)
    return w_start + t * (w_end - w_start)


def perceptual_loss(vgg_params, generated01, target01, *,
                    weights=(1.0, 1.0), dtype=None,
                    sample_weights=None) -> jnp.ndarray:
    """VGG16 feature L1 (losses.py:63-92): inputs in [0,1], clamped,
    resized to 224 when small (the 215 case), taps [8, 15]."""
    g = jnp.clip(generated01, 0.0, 1.0)
    t = jnp.clip(target01, 0.0, 1.0)
    if g.shape[1] < 200:
        g = bilinear_resize(g, (224, 224))
        t = bilinear_resize(t, (224, 224))
    gf = vgg16_features(vgg_params, g, dtype=dtype)
    tf = vgg16_features(vgg_params, t, dtype=dtype)
    loss = jnp.float32(0.0)
    for a, b, w in zip(gf, tf, weights):
        loss = loss + w * l1_loss(a, b, sample_weights=sample_weights)
    return loss


def vae_loss(vgg_params, generated, target, mu, logvar, *,
             reconstruction_weight: float = 1.0,
             perceptual_weight: float = 0.01,
             kl_weight, free_bits: Optional[float] = None,
             dtype=None,
             sample_weights=None) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """CombinedLoss (losses.py:121-162) with an annealed (traced) kl_weight.

    generated/target in [-1, 1]; perceptual term sees [0, 1]
    (losses.py:136-144).
    """
    recon = l1_loss(generated, target, sample_weights=sample_weights)
    perc = perceptual_loss(
        vgg_params, (generated + 1.0) / 2.0, (target + 1.0) / 2.0, dtype=dtype,
        sample_weights=sample_weights,
    )
    if free_bits is not None:
        kl = kl_divergence_free_bits(mu, logvar, free_bits,
                                     sample_weights=sample_weights)
    else:
        kl = kl_divergence(mu, logvar, sample_weights=sample_weights)
    total = reconstruction_weight * recon + perceptual_weight * perc + kl_weight * kl
    return total, {
        "total_loss": total,
        "reconstruction_loss": recon,
        "perceptual_loss": perc,
        "kl_loss": kl,
    }
