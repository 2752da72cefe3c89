"""Weight initializers matching the distributions the reference uses.

The reference UNet init (src/models/unet.py:405-426): conv -> kaiming normal
(fan_out, relu); linear -> xavier uniform gain 0.02; groupnorm -> ones/zeros;
final conv -> xavier uniform gain 0.02.  The VAE uses torch layer defaults
(kaiming uniform with a=sqrt(5) for both conv and linear).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def zeros(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def _fans_conv(shape):
    # HWIO layout: (kh, kw, cin, cout)
    kh, kw, cin, cout = shape
    rf = kh * kw
    return cin * rf, cout * rf


def _fans_linear(shape):
    # (in, out)
    return shape[0], shape[1]


def _fans(shape):
    if len(shape) == 4:
        return _fans_conv(shape)
    if len(shape) == 2:
        return _fans_linear(shape)
    raise ValueError(f"unsupported shape {shape}")


def kaiming_normal(key, shape, dtype=jnp.float32, mode="fan_out"):
    """He normal with relu gain (torch kaiming_normal_(mode='fan_out'))."""
    fan_in, fan_out = _fans(shape)
    fan = fan_out if mode == "fan_out" else fan_in
    std = math.sqrt(2.0) / math.sqrt(fan)
    return std * jax.random.normal(key, shape, dtype)


def kaiming_uniform_torch(key, shape, dtype=jnp.float32):
    """torch's default layer init: kaiming_uniform_(a=sqrt(5)) over fan_in.

    gain = sqrt(2 / (1 + a^2)) = sqrt(1/3); bound = gain * sqrt(3/fan_in)
          = 1/sqrt(fan_in).
    """
    fan_in, _ = _fans(shape)
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_default_bias(key, shape, fan_in, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def xavier_uniform(key, shape, dtype=jnp.float32, gain=1.0):
    fan_in, fan_out = _fans(shape)
    bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)
