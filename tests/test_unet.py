"""UNet contract tests: in/out shape equality, parameter parity with the
reference (655,561,736 at text_dim=768), and gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psg_tpu.models.unet import UNetSpec, unet_apply, unet_init, pooled_text


TINY = UNetSpec(text_dim=32, channels=(32, 48, 64, 64), num_heads=4,
                time_emb_dim=32)


def _count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def test_param_count_matches_reference_exactly():
    key = jax.random.PRNGKey(0)
    for text_dim, expected in [(768, 655_561_736), (256, 640_488_456)]:
        spec = UNetSpec(text_dim=text_dim, num_heads=8)
        shapes = jax.eval_shape(lambda k: unet_init(k, spec), key)
        assert _count(shapes) == expected, text_dim


@pytest.fixture(scope="module")
def tiny_unet():
    return unet_init(jax.random.PRNGKey(0), TINY)


def test_output_shape_matches_input(tiny_unet):
    x = jnp.zeros((2, 27, 27, 8))
    t = jnp.array([0, 999])
    txt = jnp.zeros((2, 16, 32))
    fn = jax.jit(lambda p, x, t, s: unet_apply(p, x, t, s, TINY))
    out = fn(tiny_unet, x, t, txt)
    assert out.shape == x.shape


def test_text_mask_changes_output(tiny_unet):
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (1, 27, 27, 8))
    t = jnp.array([500])
    txt = jax.random.normal(key, (1, 16, 32))
    mask = jnp.concatenate([jnp.ones((1, 8)), jnp.zeros((1, 8))], axis=1)
    out_full = unet_apply(tiny_unet, x, t, txt, TINY)
    out_masked = unet_apply(tiny_unet, x, t, txt, TINY, text_mask=mask)
    assert float(jnp.max(jnp.abs(out_full - out_masked))) > 1e-6


def test_pooled_text_masked_mean():
    txt = jnp.stack([jnp.ones((4, 3)), 2 * jnp.ones((4, 3))])  # [2,4,3]
    mask = jnp.array([[1, 1, 0, 0], [1, 1, 1, 1]], jnp.float32)
    pooled = pooled_text(txt, mask)
    np.testing.assert_allclose(pooled, [[1, 1, 1], [2, 2, 2]], rtol=1e-6)
    pooled_plain = pooled_text(txt)
    np.testing.assert_allclose(pooled_plain, [[1, 1, 1], [2, 2, 2]], rtol=1e-6)


def test_gradient_flow(tiny_unet):
    """Analog of the reference's gradient-flow smoke test
    (tests/test_model_compatibility.py:147-169)."""
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (1, 27, 27, 8))
    t = jnp.array([100])
    txt = jax.random.normal(key, (1, 8, 32))
    noise = jax.random.normal(key, (1, 27, 27, 8))

    def loss_fn(p):
        pred = unet_apply(p, x, t, txt, TINY)
        return jnp.mean((pred - noise) ** 2)

    grads = jax.jit(jax.grad(loss_fn))(tiny_unet)
    gnorms = [float(jnp.linalg.norm(g)) for g in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(g) for g in gnorms)
    # the vast majority of parameters must receive gradient
    nonzero = sum(g > 0 for g in gnorms)
    assert nonzero / len(gnorms) > 0.9


def test_timestep_changes_output(tiny_unet):
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (1, 27, 27, 8))
    txt = jax.random.normal(key, (1, 8, 32))
    o1 = unet_apply(tiny_unet, x, jnp.array([0]), txt, TINY)
    o2 = unet_apply(tiny_unet, x, jnp.array([999]), txt, TINY)
    # the near-zero-init final conv (gain 0.02) keeps absolute outputs tiny;
    # any nonzero dependence on t is what we're asserting
    assert float(jnp.max(jnp.abs(o1 - o2))) > 1e-9


def test_batched_cfg_matches_two_calls():
    """Serving fuses both CFG branches into one batch-2N call
    (generator.py); per-sample independence of the UNet (GroupNorm/attention
    are per-sample) makes it equivalent to two separate calls."""
    key = jax.random.PRNGKey(0)
    params = unet_init(key, TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 27, 27, 8))
    t = jnp.array([7, 500])
    emb_c = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 32))
    emb_u = jnp.zeros_like(emb_c)
    eps_c = unet_apply(params, x, t, emb_c, TINY)
    eps_u = unet_apply(params, x, t, emb_u, TINY)
    fused = unet_apply(params, jnp.concatenate([x, x]),
                       jnp.concatenate([t, t]),
                       jnp.concatenate([emb_c, emb_u]), TINY)
    np.testing.assert_allclose(np.asarray(fused[:2]), np.asarray(eps_c),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(fused[2:]), np.asarray(eps_u),
                               atol=1e-5)
