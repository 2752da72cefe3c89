"""Bilinear resize with torch ``align_corners=False`` (half-pixel) semantics.

The reference upsamples with ``nn.Upsample(mode='bilinear',
align_corners=False)`` at exact target sizes (src/models/vae_decoder.py:
149-161, src/models/unet.py:364-387).  ``jax.image.resize(method='linear')``
uses half-pixel centers, which matches align_corners=False.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_resize(x, size):
    """x: [B, H, W, C] -> [B, size[0], size[1], C].

    bf16 inputs resize in bf16 (interpolation weights are exact dyadic-ish
    fractions; the ~3-decimal-digit bf16 error is far below model noise and
    the fp32 round trip costs real HBM bandwidth in the sampling chain);
    everything else resizes in fp32.
    """
    b, _, _, c = x.shape
    out_shape = (b, size[0], size[1], c)
    if x.dtype == jnp.bfloat16:
        return jax.image.resize(x, out_shape, method="linear")
    orig_dtype = x.dtype
    y = jax.image.resize(x.astype(jnp.float32), out_shape, method="linear")
    return y.astype(orig_dtype)
