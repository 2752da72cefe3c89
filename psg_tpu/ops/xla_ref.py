"""Pure-XLA reference implementations of the hot ops.

Numerics policy: QK^T and PV matmuls accumulate fp32 on the MXU
(``preferred_element_type``), softmax always in fp32 — this is the
structural replacement for the reference's attention-output damping and
try/except NaN skipping (src/models/unet.py:213-255).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def sdpa_xla(q, k, v, *, bias=None, scale=None):
    """q: [B,H,Lq,D], k/v: [B,H,Lk,D] -> [B,H,Lq,D] (q's dtype)."""
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    scores = scores.astype(jnp.float32) * scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    # stable softmax in fp32
    scores = scores - lax.stop_gradient(jnp.max(scores, axis=-1, keepdims=True))
    probs = jnp.exp(scores)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)
