"""Functional layer primitives (NHWC, TPU-native layouts).

Every layer is a pair of functions: ``*_init(key, ...) -> params`` (a dict of
fp32 arrays) and a pure ``apply`` function.  Conv kernels are stored HWIO so
XLA maps them straight onto the MXU without transposes; the torch reference
is NCHW/OIHW (converters in psg_tpu.models.convert handle the transpose).

Padding semantics: the reference relies on torch's floor-division output
sizes (e.g. Conv2d(k=4, s=2, p=1): 215 -> 107, and k=4 s=2 p=2: 53 -> 27,
src/models/vae_decoder.py:76-101).  We always pass explicit per-edge padding
to ``lax.conv_general_dilated``, which has identical floor semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from psg_tpu.nn import init as wi

# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------


def linear_init(key, in_dim: int, out_dim: int, *, init: str = "torch",
                gain: float = 1.0, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    if init == "torch":
        w = wi.kaiming_uniform_torch(kw, (in_dim, out_dim), dtype)
        b = wi.torch_default_bias(kb, (out_dim,), in_dim, dtype)
    elif init == "xavier":
        w = wi.xavier_uniform(kw, (in_dim, out_dim), dtype, gain=gain)
        b = jnp.zeros((out_dim,), dtype)
    elif init == "zeros":
        w = jnp.zeros((in_dim, out_dim), dtype)
        b = jnp.zeros((out_dim,), dtype)
    else:
        raise ValueError(init)
    return {"w": w, "b": b}


def linear(params, x, *, dtype=None):
    w = params["w"]
    b = params["b"]
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return y + b.astype(y.dtype)


# ---------------------------------------------------------------------------
# Conv2d (NHWC x HWIO -> NHWC)
# ---------------------------------------------------------------------------


def conv2d_init(key, cin: int, cout: int, kernel: int, *, init: str = "torch",
                gain: float = 1.0, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    shape = (kernel, kernel, cin, cout)
    if init == "torch":
        w = wi.kaiming_uniform_torch(kw, shape, dtype)
        b = wi.torch_default_bias(kb, (cout,), cin * kernel * kernel, dtype)
    elif init == "kaiming_normal":
        w = wi.kaiming_normal(kw, shape, dtype, mode="fan_out")
        b = jnp.zeros((cout,), dtype)
    elif init == "xavier":
        w = wi.xavier_uniform(kw, shape, dtype, gain=gain)
        b = jnp.zeros((cout,), dtype)
    else:
        raise ValueError(init)
    return {"w": w, "b": b}


def conv2d(params, x, *, stride: int = 1, padding: int = 0, dtype=None):
    """2-D convolution, torch-compatible symmetric integer padding.

    Args:
        x: [B, H, W, Cin]
        params['w']: [kh, kw, Cin, Cout]
    """
    w = params["w"]
    b = params["b"]
    if dtype is not None:
        # mixed precision: inputs/kernel/output in `dtype` (the TPU MXU
        # still accumulates fp32 internally).  Forcing an fp32 output via
        # preferred_element_type would break autodiff — the conv transpose
        # rule then sees an fp32 cotangent against a bf16 kernel, and
        # lax.conv requires matching dtypes.
        x, w = x.astype(dtype), w.astype(dtype)
        pet = None
    else:
        pet = jnp.float32
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pet,
    )
    return y + b.astype(y.dtype)


# ---------------------------------------------------------------------------
# GroupNorm (channels-last), with the reference's group-count rule
# ---------------------------------------------------------------------------


def largest_group_count(channels: int, max_groups: int = 32) -> int:
    """Largest divisor of ``channels`` that is <= max_groups.

    Mirrors the reference's loop (src/models/unet.py:70-76).
    """
    g = min(max_groups, channels)
    while channels % g != 0 and g > 1:
        g -= 1
    return max(1, g)


def group_norm_init(channels: int, dtype=jnp.float32):
    return {"scale": jnp.ones((channels,), dtype), "bias": jnp.zeros((channels,), dtype)}


def group_norm(params, x, num_groups: int, *, eps: float = 1e-5):
    """GroupNorm over a channels-last tensor.

    Accepts [B, ..., C]; statistics are computed per (batch, group) over all
    non-batch axes, in fp32 regardless of input dtype (structural stability —
    replaces the reference's NaN scrubbing).
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    b = xf.shape[0]
    c = xf.shape[-1]
    spatial = xf.shape[1:-1]
    gsize = c // num_groups
    xg = xf.reshape((b, -1, num_groups, gsize))  # [B, S, G, C/G]
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 3), keepdims=True)
    xn = (xg - mean) * lax.rsqrt(var + eps)
    xn = xn.reshape((b,) + spatial + (c,))
    out = xn * params["scale"] + params["bias"]
    return out.astype(orig_dtype)


# ---------------------------------------------------------------------------
# LayerNorm
# ---------------------------------------------------------------------------


def layer_norm_init(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(params, x, *, eps: float = 1e-5):
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * lax.rsqrt(var + eps)
    out = xn * params["scale"] + params["bias"]
    return out.astype(orig_dtype)


# ---------------------------------------------------------------------------
# Serving-time weight storage dtype
# ---------------------------------------------------------------------------


def cast_matmul_weights(params, dtype=jnp.bfloat16):
    """Cast matmul/conv kernels (dict leaves named ``"w"``, ndim >= 2) to
    ``dtype`` for inference, leaving biases and norm scale/bias in fp32.

    Bit-identical to fp32 storage when the apply functions already run with
    ``dtype=bfloat16`` (every ``linear``/``conv2d``/``mha`` call casts ``w``
    to the compute dtype before the dot, and biases are added AFTER the
    fp32-accumulated dot) — but the weights occupy half the HBM, the denoise
    loop's per-step weight reads halve if XLA keeps the casts in-loop, and
    host->device transfer of a 2.6 GB UNet halves at load.
    """

    def cast(path, leaf):
        last = path[-1]
        name = getattr(last, "key", None)
        if name == "w" and hasattr(leaf, "ndim") and leaf.ndim >= 2:
            return leaf.astype(dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(cast, params)
