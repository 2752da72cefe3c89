"""Timestep embeddings.

Fixed sinusoidal embedding matching the reference's TimestepEmbedding
buffer math (src/models/unet.py:22-50): ``coeff = exp(-ln(10000) *
arange(half) / (half - 1))``, concat(sin, cos).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def sinusoidal_time_embedding(timesteps, dim: int):
    """timesteps: [B] (int or float) -> [B, dim] fp32."""
    half = dim // 2
    coeff = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1))
    )
    args = timesteps.astype(jnp.float32)[:, None] * coeff[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
