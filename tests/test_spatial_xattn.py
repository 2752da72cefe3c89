"""Fused spatial cross-attention kernel: parity vs the XLA path.

Runs the Pallas kernel in interpret mode (CPU) against the plain
spatial_cross_attention implementation — same params, both reshape
conventions, masked text, non-block-divisible query counts, and gradients
(custom_vjp backward)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psg_tpu.nn.attention import (
    spatial_cross_attention,
    spatial_cross_attention_init,
)
from psg_tpu.models.unet import text_bias_from_mask
from psg_tpu.ops.spatial_xattn import _ref_impl, fused_spatial_xattn
from psg_tpu.nn.layers import group_norm, largest_group_count, linear

B, HW, C, S, TEXT_DIM, HEADS = 2, 21, 64, 12, 48, 8  # L=441: 1 partial block


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    params = spatial_cross_attention_init(key, C, TEXT_DIM)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, HW, HW, C))
    text = jax.random.normal(jax.random.PRNGKey(2), (B, S, TEXT_DIM))
    mask = np.ones((B, S), np.int32)
    mask[1, 7:] = 0
    return params, x, text, jnp.asarray(mask)


def _fused_out(params, x, text, bias, compat, tq=128):
    b, h, w, c = x.shape
    xn = group_norm(params["norm"], x, num_groups=largest_group_count(c),
                    eps=1e-5)
    k = linear(params["k"], text)
    v = linear(params["v"], text)
    out = fused_spatial_xattn(
        xn.reshape(b, h * w, c), x.reshape(b, h * w, c), k, v,
        params["q"]["w"].reshape(c, c), params["q"]["b"],
        params["proj"]["w"].reshape(c, c), params["proj"]["b"],
        num_heads=HEADS, text_bias=bias, compat_reshape=compat,
        interpret=True)
    return out.reshape(b, h, w, c)


@pytest.mark.parametrize("compat", [False, True])
@pytest.mark.parametrize("masked", [False, True])
def test_fused_matches_xla_path(setup, compat, masked):
    params, x, text, mask = setup
    bias = text_bias_from_mask(mask) if masked else None
    ref = spatial_cross_attention(params, x, text, num_heads=HEADS,
                                  text_bias=bias, compat_reshape=compat)
    got = _fused_out(params, x, text, bias, compat)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_gradients_match(setup):
    """custom_vjp backward (reference recompute) == XLA-path gradients."""
    params, x, text, mask = setup
    bias = text_bias_from_mask(mask)

    def loss_fused(p, x):
        return jnp.sum(_fused_out(p, x, text, bias, False) ** 2)

    def loss_ref(p, x):
        return jnp.sum(spatial_cross_attention(
            p, x, text, num_heads=HEADS, text_bias=bias) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1))(params, x)
    gr = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_cold_head_no_underflow_nan(setup):
    """Regression (r3 stage-1 NaN root cause): when one head's logits sit
    far (>88, the fp32 exp underflow range) below another head's, the
    softmax must stay per-head — a global row max zeroes the cold head's
    forward output and NaNs the backward.  Scale the Q projection so head
    logit magnitudes explode, then require (a) forward parity with the
    XLA path, (b) finite gradients that match the XLA path's."""
    params, x, text, mask = setup
    # amplify Q so scores span hundreds: hot heads >> cold heads
    params = jax.tree_util.tree_map(lambda a: a, params)
    params["q"] = {"w": params["q"]["w"] * 120.0, "b": params["q"]["b"]}
    bias = text_bias_from_mask(mask)

    ref = spatial_cross_attention(params, x, text, num_heads=HEADS,
                                  text_bias=bias)
    got = _fused_out(params, x, text, bias, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)

    def loss_fused(p, x):
        return jnp.mean(_fused_out(p, x, text, bias, False) ** 2)

    def loss_ref(p, x):
        return jnp.mean(spatial_cross_attention(
            p, x, text, num_heads=HEADS, text_bias=bias) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1))(params, x)
    gr = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gr)):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-2)


def test_ref_impl_matches_kernel_math(setup):
    """The jnp twin used for the backward equals the kernel output."""
    params, x, text, mask = setup
    b, h, w, c = x.shape
    xn = group_norm(params["norm"], x, num_groups=largest_group_count(c),
                    eps=1e-5).reshape(b, h * w, c)
    res = x.reshape(b, h * w, c)
    k = linear(params["k"], text)
    v = linear(params["v"], text)

    # build the same block-diagonal operands via the public wrapper path
    # then evaluate both implementations on them
    from psg_tpu.ops import spatial_xattn as sx

    captured = {}
    orig = sx._fused

    def spy(xn_, res_, kbd, vst, bias, wq, bq, wp, bp, heads, seq, scale,
            tq, interpret):
        captured.update(dict(args=(xn_, res_, kbd, vst, bias, wq, bq, wp, bp),
                             heads=heads, seq=seq, scale=scale))
        return orig(xn_, res_, kbd, vst, bias, wq, bq, wp, bp, heads, seq,
                    scale, tq, interpret)

    sx._fused = spy
    try:
        out = fused_spatial_xattn(
            xn, res, k, v, params["q"]["w"].reshape(c, c), params["q"]["b"],
            params["proj"]["w"].reshape(c, c), params["proj"]["b"],
            num_heads=HEADS, text_bias=text_bias_from_mask(mask),
            interpret=True)
    finally:
        sx._fused = orig
    ref = _ref_impl(*captured["args"], heads=captured["heads"],
                    seq=captured["seq"], scale=captured["scale"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
