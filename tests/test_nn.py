"""Parity tests of the nn primitives against torch CPU ops.

These pin the semantics the models rely on: torch floor-division conv
output sizes (incl. the k4/s2 asymmetric cases), GroupNorm statistics,
align_corners=False bilinear resize, and nn.MultiheadAttention.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from psg_tpu.nn.layers import (
    conv2d,
    group_norm,
    group_norm_init,
    largest_group_count,
    layer_norm,
    layer_norm_init,
    linear,
)
from psg_tpu.nn.attention import mha, mha_init
from psg_tpu.nn.embeddings import sinusoidal_time_embedding
from psg_tpu.nn.resize import bilinear_resize


def _np(x):
    return np.asarray(x)


@pytest.mark.parametrize(
    "hw,cin,cout,k,s,p",
    [
        (215, 3, 8, 4, 2, 1),  # VAE encoder stage 1: 215 -> 107
        (53, 4, 6, 4, 2, 2),   # VAE encoder stage 3: 53 -> 27
        (27, 8, 16, 3, 2, 1),  # UNet downsample: 27 -> 14
        (27, 8, 16, 3, 1, 1),  # SAME-style 3x3
        (9, 8, 16, 1, 1, 0),   # 1x1
    ],
)
def test_conv2d_matches_torch(hw, cin, cout, k, s, p):
    rng = np.random.RandomState(0)
    x = rng.randn(2, hw, hw, cin).astype(np.float32)
    w = rng.randn(k, k, cin, cout).astype(np.float32) * 0.1
    b = rng.randn(cout).astype(np.float32)

    ours = conv2d({"w": jnp.array(w), "b": jnp.array(b)}, jnp.array(x),
                  stride=s, padding=p)

    xt = torch.tensor(x).permute(0, 3, 1, 2)
    wt = torch.tensor(w).permute(3, 2, 0, 1)  # HWIO -> OIHW
    ref = TF.conv2d(xt, wt, torch.tensor(b), stride=s, padding=p)
    ref = ref.permute(0, 2, 3, 1).numpy()

    assert ours.shape == ref.shape
    np.testing.assert_allclose(_np(ours), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("c,groups,eps", [(32, 32, 1e-5), (64, 32, 1e-6), (48, 16, 1e-5)])
def test_group_norm_matches_torch(c, groups, eps):
    rng = np.random.RandomState(1)
    x = rng.randn(2, 7, 7, c).astype(np.float32)
    scale = rng.randn(c).astype(np.float32)
    bias = rng.randn(c).astype(np.float32)

    ours = group_norm({"scale": jnp.array(scale), "bias": jnp.array(bias)},
                      jnp.array(x), groups, eps=eps)

    gn = torch.nn.GroupNorm(groups, c, eps=eps)
    with torch.no_grad():
        gn.weight.copy_(torch.tensor(scale))
        gn.bias.copy_(torch.tensor(bias))
    ref = gn(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).detach().numpy()
    np.testing.assert_allclose(_np(ours), ref, rtol=1e-4, atol=1e-4)


def test_group_norm_on_sequence_matches_torch():
    # The UNet applies GroupNorm to [B, S, C] sequences by permuting to
    # channels-first (reference: unet.py:214,231); our group_norm on
    # [B, S, C] must match torch GroupNorm on [B, C, S].
    rng = np.random.RandomState(2)
    b, s, c, g = 2, 49, 64, 32
    x = rng.randn(b, s, c).astype(np.float32)
    gn = torch.nn.GroupNorm(g, c, eps=1e-6)
    ref = gn(torch.tensor(x).permute(0, 2, 1)).permute(0, 2, 1).detach().numpy()
    ours = group_norm(group_norm_init(c), jnp.array(x), g, eps=1e-6)
    np.testing.assert_allclose(_np(ours), ref, rtol=1e-4, atol=1e-4)


def test_layer_norm_matches_torch():
    rng = np.random.RandomState(3)
    x = rng.randn(2, 5, 96).astype(np.float32)
    ours = layer_norm(layer_norm_init(96), jnp.array(x))
    ref = TF.layer_norm(torch.tensor(x), (96,)).numpy()
    np.testing.assert_allclose(_np(ours), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("src,dst", [(27, 54), (108, 215), (4, 7), (14, 27)])
def test_bilinear_resize_matches_torch(src, dst):
    rng = np.random.RandomState(4)
    x = rng.randn(2, src, src, 3).astype(np.float32)
    ours = bilinear_resize(jnp.array(x), (dst, dst))
    ref = TF.interpolate(torch.tensor(x).permute(0, 3, 1, 2), size=(dst, dst),
                         mode="bilinear", align_corners=False)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(_np(ours), ref, rtol=1e-4, atol=1e-4)


def test_mha_matches_torch_multihead_attention():
    """Copy weights into torch nn.MultiheadAttention and compare outputs."""
    dim, heads, b, lq, lk = 64, 4, 2, 9, 5
    rng = np.random.RandomState(5)
    q = rng.randn(b, lq, dim).astype(np.float32)
    kv = rng.randn(b, lk, dim).astype(np.float32)

    key = jax.random.PRNGKey(0)
    params = mha_init(key, dim)
    ours = mha(params, jnp.array(q), jnp.array(kv), heads)

    t = torch.nn.MultiheadAttention(dim, heads, dropout=0.0, batch_first=True)
    with torch.no_grad():
        # our in_proj w is (dim, 3*dim) x-right-multiplied; torch's is (3*dim, dim)
        t.in_proj_weight.copy_(torch.tensor(np.asarray(params["in_proj"]["w"]).T))
        t.in_proj_bias.copy_(torch.tensor(np.asarray(params["in_proj"]["b"])))
        t.out_proj.weight.copy_(torch.tensor(np.asarray(params["out_proj"]["w"]).T))
        t.out_proj.bias.copy_(torch.tensor(np.asarray(params["out_proj"]["b"])))
    ref, _ = t(torch.tensor(q), torch.tensor(kv), torch.tensor(kv))
    np.testing.assert_allclose(_np(ours), ref.detach().numpy(), rtol=1e-4, atol=1e-4)


def test_sinusoidal_time_embedding_matches_reference_formula():
    import math

    dim = 128
    ts = np.array([0, 1, 500, 999], dtype=np.float32)
    ours = sinusoidal_time_embedding(jnp.array(ts), dim)
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    coeff = np.exp(np.arange(half) * -emb)
    args = ts[:, None] * coeff[None, :]
    ref = np.concatenate([np.sin(args), np.cos(args)], axis=-1)
    # fp32 sin/cos argument reduction at t~1000 costs ~1e-4 of accuracy
    np.testing.assert_allclose(_np(ours), ref, rtol=1e-4, atol=5e-4)


def test_largest_group_count():
    # mirrors unet.py:70-76
    assert largest_group_count(320) == 32
    assert largest_group_count(640) == 32
    assert largest_group_count(1280) == 32
    assert largest_group_count(8) == 8
    assert largest_group_count(48) == 24
    assert largest_group_count(7) == 7


def test_linear_bias_and_shape():
    p = {"w": jnp.ones((3, 4)), "b": jnp.arange(4, dtype=jnp.float32)}
    y = linear(p, jnp.ones((2, 3)))
    np.testing.assert_allclose(_np(y), np.array([[3, 4, 5, 6]] * 2, np.float32))


def test_cast_matmul_weights_bit_identical_under_bf16_compute():
    """Serving stores matmul kernels in bf16 (generator.py); outputs must be
    bit-identical to fp32 storage because apply fns cast w to the compute
    dtype anyway and biases/norms stay fp32."""
    from psg_tpu.models.unet import UNetSpec, unet_apply, unet_init
    from psg_tpu.nn import cast_matmul_weights

    spec = UNetSpec(text_dim=32, channels=(16, 24, 32, 32), num_heads=4,
                    time_emb_dim=16)
    key = jax.random.PRNGKey(0)
    params = unet_init(key, spec)
    q = cast_matmul_weights(params, jnp.bfloat16)
    # every >=2D "w" leaf halves; biases and norm scale/bias stay fp32
    flat = jax.tree_util.tree_leaves_with_path(q)
    assert any(x.dtype == jnp.bfloat16 for _, x in flat)
    for path, leaf in flat:
        name = getattr(path[-1], "key", None)
        if name == "w" and leaf.ndim >= 2:
            assert leaf.dtype == jnp.bfloat16
        else:
            assert leaf.dtype == jnp.float32, path

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 27, 27, 8), jnp.float32)
    t = jnp.array([3, 500])
    text = jax.random.normal(jax.random.PRNGKey(2), (2, 9, 32), jnp.float32)
    a = unet_apply(params, x.astype(jnp.bfloat16), t, text.astype(jnp.bfloat16),
                   spec, dtype=jnp.bfloat16)
    b = unet_apply(q, x.astype(jnp.bfloat16), t, text.astype(jnp.bfloat16),
                   spec, dtype=jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(a, np.float32),
                                  np.asarray(b, np.float32))
