"""VAE contract tests: exact interface shapes (reference
tests/test_dimensions.py), parameter-count parity, and mode semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psg_tpu.models.vae import (
    vae_apply,
    vae_decode,
    vae_encoder_apply,
    vae_init,
    reparameterize,
)


def _count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def test_param_count_matches_reference_exactly():
    """Reference PokemonVAE: 26,930,483 params at text_dim=768 and
    25,914,675 at text_dim=256 (SURVEY.md §2.1, measured from
    vae_decoder.py)."""
    key = jax.random.PRNGKey(0)
    shapes768 = jax.eval_shape(lambda k: vae_init(k, 8, 768), key)
    shapes256 = jax.eval_shape(lambda k: vae_init(k, 8, 256), key)
    assert _count(shapes768) == 26_930_483
    assert _count(shapes256) == 25_914_675


@pytest.fixture(scope="module")
def small_vae():
    key = jax.random.PRNGKey(42)
    return vae_init(key, latent_dim=8, text_dim=64)


def test_encoder_shape_215_to_27(small_vae):
    x = jnp.zeros((1, 215, 215, 3))
    mu, logvar = jax.jit(vae_encoder_apply)(small_vae["encoder"], x)
    assert mu.shape == (1, 27, 27, 8)
    assert logvar.shape == (1, 27, 27, 8)


def test_full_roundtrip_and_modes(small_vae):
    key = jax.random.PRNGKey(1)
    imgs = jax.random.normal(key, (1, 215, 215, 3))
    txt = jax.random.normal(key, (1, 16, 64))

    apply = jax.jit(vae_apply, static_argnames=("mode",))
    out = apply(small_vae, key, imgs, txt, mode="train")
    assert out["reconstructed"].shape == (1, 215, 215, 3)
    assert out["latent"].shape == (1, 27, 27, 8)
    # tanh output range
    assert float(jnp.max(jnp.abs(out["reconstructed"]))) <= 1.0

    # 'generate' mode is deterministic: latent == mu
    out_g = apply(small_vae, key, imgs, txt, mode="generate")
    np.testing.assert_allclose(out_g["latent"], out_g["mu"])

    # 'sample' mode ignores images
    out_s = apply(small_vae, key, None, txt, mode="sample")
    assert out_s["mu"] is None
    assert out_s["reconstructed"].shape == (1, 215, 215, 3)


def test_reparameterize_statistics():
    key = jax.random.PRNGKey(7)
    mu = jnp.full((4, 27, 27, 8), 2.0)
    logvar = jnp.zeros((4, 27, 27, 8))
    z = reparameterize(key, mu, logvar)
    assert abs(float(jnp.mean(z)) - 2.0) < 0.05
    assert abs(float(jnp.std(z)) - 1.0) < 0.05


def test_decode_seeded_determinism(small_vae):
    key = jax.random.PRNGKey(3)
    lat = jax.random.normal(key, (1, 27, 27, 8))
    txt = jax.random.normal(key, (1, 8, 64))
    a = vae_decode(small_vae, lat, txt)
    b = vae_decode(small_vae, lat, txt)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
