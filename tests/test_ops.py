"""Pallas kernel correctness vs the XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psg_tpu.ops.xla_ref import sdpa_xla


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


@pytest.mark.parametrize("b,h,lq,lk,d", [
    (2, 4, 49, 49, 32),     # UNet self-attn level shape
    (1, 8, 729, 128, 64),   # VAE decoder 27x27 cross-attn
    (2, 8, 100, 128, 4),    # tiny head_dim (32ch / 8 heads)
    (1, 2, 9, 16, 16),      # odd everything
])
def test_flash_matches_xla(b, h, lq, lk, d):
    from jax.experimental.pallas import tpu as pltpu

    from psg_tpu.ops.flash_attention import flash_sdpa

    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = _rand(keys[0], (b, h, lq, d))
    k = _rand(keys[1], (b, h, lk, d))
    v = _rand(keys[2], (b, h, lk, d))

    ref = sdpa_xla(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        out = flash_sdpa(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_flash_with_key_padding_bias():
    from jax.experimental.pallas import tpu as pltpu

    from psg_tpu.ops.flash_attention import flash_sdpa

    b, h, lq, lk, d = 2, 4, 32, 24, 16
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    q = _rand(keys[0], (b, h, lq, d))
    k = _rand(keys[1], (b, h, lk, d))
    v = _rand(keys[2], (b, h, lk, d))
    mask = jnp.concatenate([jnp.ones((b, 16)), jnp.zeros((b, 8))], axis=1)
    bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9)

    ref = sdpa_xla(q, k, v, bias=bias)
    with pltpu.force_tpu_interpret_mode():
        out = flash_sdpa(q, k, v, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_flash_rejects_causal_bias():
    from psg_tpu.ops.flash_attention import flash_sdpa

    b, h, s, d = 1, 2, 8, 16
    q = _rand(jax.random.PRNGKey(0), (b, h, s, d))
    bias = jnp.zeros((b, h, s, s))
    with pytest.raises(NotImplementedError):
        flash_sdpa(q, q, q, bias=bias)


def test_dispatch_uses_xla_on_cpu():
    from psg_tpu import ops

    q = _rand(jax.random.PRNGKey(0), (1, 2, 8, 16))
    out = ops.sdpa(q, q, q)
    ref = sdpa_xla(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("b,s,c,g", [(2, 64, 32, 8), (1, 729, 320, 32),
                                     (2, 49, 48, 16)])
def test_fused_group_norm_silu_matches_reference(b, s, c, g):
    from jax.experimental.pallas import tpu as pltpu

    from psg_tpu.nn.layers import group_norm
    from psg_tpu.ops.fused_norm import fused_group_norm_silu

    x = jax.random.normal(jax.random.PRNGKey(0), (b, s, c)) * 2 + 0.3
    p = {"scale": jnp.linspace(0.5, 1.5, c), "bias": jnp.linspace(-0.2, 0.2, c)}
    ref = jax.nn.silu(group_norm(p, x, g))
    with pltpu.force_tpu_interpret_mode():
        out = fused_group_norm_silu(p, x, g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-5)


def test_fused_group_norm_4d_input():
    from jax.experimental.pallas import tpu as pltpu

    from psg_tpu.nn.layers import group_norm
    from psg_tpu.ops.fused_norm import fused_group_norm_silu

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 9, 9, 16))
    p = {"scale": jnp.ones(16), "bias": jnp.zeros(16)}
    ref = jax.nn.silu(group_norm(p, x, 8))
    with pltpu.force_tpu_interpret_mode():
        out = fused_group_norm_silu(p, x, 8)
    assert out.shape == x.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-5)


def test_fused_group_norm_vmem_gate():
    from psg_tpu.ops.fused_norm import fits_vmem, fused_group_norm_silu

    assert fits_vmem((4, 729, 320))
    assert not fits_vmem((1, 46225, 64))
    with pytest.raises(ValueError):
        fused_group_norm_silu({"scale": jnp.ones(64), "bias": jnp.zeros(64)},
                              jnp.zeros((1, 46225, 64)), 32)


def test_group_norm_silu_dispatch_cpu_fallback():
    from psg_tpu import ops
    from psg_tpu.nn.layers import group_norm

    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 32))
    p = {"scale": jnp.ones(32), "bias": jnp.zeros(32)}
    out = ops.group_norm_silu(p, x, 8)
    ref = jax.nn.silu(group_norm(p, x, 8))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)
