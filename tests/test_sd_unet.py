"""SD-1.5-family UNet tests: shapes on the odd 27/14/7/4 ladder, channel
adaptation semantics, training-mode masks, param count vs SD-1.5."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psg_tpu.models.sd_unet import (
    SDUNetSpec,
    adapt_in_channels,
    adapt_out_channels,
    sd_timestep_embedding,
    sd_training_mask,
    sd_unet_apply,
    sd_unet_init,
    sd_wrapper_apply,
    sd_wrapper_init,
)

TINY = SDUNetSpec.tiny_test(text_dim=20)


def _count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


@pytest.fixture(scope="module")
def tiny():
    return sd_unet_init(jax.random.PRNGKey(0), TINY)


def test_param_count_close_to_sd15():
    """SD-1.5 UNet has ~860M params (SURVEY.md §2.1); the native
    implementation must land in that ballpark (exact value depends on
    diffusers version details)."""
    shapes = jax.eval_shape(lambda k: sd_unet_init(k, SDUNetSpec.sd15()),
                            jax.random.PRNGKey(0))
    n = _count(shapes)
    assert 820e6 < n < 900e6, n


def test_forward_shape_on_odd_ladder(tiny):
    x = jnp.zeros((2, 27, 27, 4))
    t = jnp.array([0, 999])
    txt = jnp.zeros((2, 12, 20))
    out = jax.jit(lambda p, x, t, s: sd_unet_apply(p, x, t, s, TINY))(
        tiny, x, t, txt)
    assert out.shape == (2, 27, 27, 4)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_timestep_embedding_flip_and_denominator():
    emb = sd_timestep_embedding(jnp.array([0.0]), 8)
    # t=0: cos-first -> ones then zeros
    np.testing.assert_allclose(np.asarray(emb[0]), [1, 1, 1, 1, 0, 0, 0, 0],
                               atol=1e-6)


def test_channel_adaptation_slice_and_tile(tiny):
    # 4 -> 2: slice
    p2 = adapt_in_channels(tiny, 2)
    np.testing.assert_array_equal(
        np.asarray(p2["conv_in"]["w"]),
        np.asarray(tiny["conv_in"]["w"][:, :, :2, :]))
    # 4 -> 8: tile + average (diffusers_unet.py:155-168)
    p8 = adapt_in_channels(tiny, 8)
    w = np.asarray(tiny["conv_in"]["w"])
    np.testing.assert_allclose(
        np.asarray(p8["conv_in"]["w"]),
        np.concatenate([w, w], axis=2) / 2, rtol=1e-6)
    # out: bias adapts too
    o8 = adapt_out_channels(tiny, 8)
    b = np.asarray(tiny["conv_out"]["b"])
    np.testing.assert_allclose(np.asarray(o8["conv_out"]["b"]),
                               np.concatenate([b, b]) / 2, rtol=1e-6)


def test_wrapper_projects_text_and_runs():
    params = sd_wrapper_init(jax.random.PRNGKey(1), TINY, text_dim=12,
                             latent_dim=8)
    assert "text_projection" in params
    assert params["unet"]["conv_in"]["w"].shape[2] == 8
    x = jnp.zeros((1, 27, 27, 8))
    out = sd_wrapper_apply(params, x, jnp.array([10]),
                           jnp.zeros((1, 6, 12)), TINY)
    assert out.shape == (1, 27, 27, 8)


def test_training_masks():
    params = sd_wrapper_init(jax.random.PRNGKey(2), TINY, text_dim=12,
                             latent_dim=8)

    def frac(m):
        leaves = jax.tree_util.tree_leaves(m)
        return sum(leaves) / len(leaves)

    m_full = sd_training_mask(params, "full")
    m_ca = sd_training_mask(params, "cross_attention_only")
    m_dec = sd_training_mask(params, "decoder_only")
    assert frac(m_full) == 1.0
    assert 0 < frac(m_ca) < frac(m_dec) < 1.0
    # structure matches params
    jax.tree_util.tree_map(lambda a, b: None, params, m_ca)
    # cross_attention_only: conv_in/out trainable, a down resnet frozen
    assert all(jax.tree_util.tree_leaves(m_ca["unet"]["conv_in"]))
    assert not any(jax.tree_util.tree_leaves(
        m_ca["unet"]["down_blocks"][0]["resnets"][0]))
    # decoder_only: up blocks trainable, down resnets frozen
    assert all(jax.tree_util.tree_leaves(m_dec["unet"]["up_blocks"]))
    assert not any(jax.tree_util.tree_leaves(
        m_dec["unet"]["down_blocks"][0]["resnets"][0]))


def test_convert_sd_unet_roundtrip_structure(tiny):
    """Converter output must match the init structure exactly; validated by
    building a fake diffusers-style state_dict from the init params."""
    import numpy as np

    from psg_tpu.models.convert import convert_sd_unet

    # build a diffusers-named state_dict carrying the same tensors
    sd = {}

    def put_conv(name, p):
        sd[f"{name}.weight"] = np.asarray(p["w"]).transpose(3, 2, 0, 1)
        sd[f"{name}.bias"] = np.asarray(p["b"])

    def put_lin(name, p):
        sd[f"{name}.weight"] = np.asarray(p["w"]).T
        sd[f"{name}.bias"] = np.asarray(p["b"])

    def put_norm(name, p):
        sd[f"{name}.weight"] = np.asarray(p["scale"])
        sd[f"{name}.bias"] = np.asarray(p["bias"])

    def put_attn(name, p):
        sd[f"{name}.to_q.weight"] = np.asarray(p["to_q"]["w"]).T
        sd[f"{name}.to_k.weight"] = np.asarray(p["to_k"]["w"]).T
        sd[f"{name}.to_v.weight"] = np.asarray(p["to_v"]["w"]).T
        put_lin(f"{name}.to_out.0", p["to_out"])

    def put_transformer(name, p):
        put_norm(f"{name}.norm", p["norm"])
        put_conv(f"{name}.proj_in", p["proj_in"])
        put_conv(f"{name}.proj_out", p["proj_out"])
        bp = f"{name}.transformer_blocks.0"
        put_norm(f"{bp}.norm1", p["norm1"])
        put_norm(f"{bp}.norm2", p["norm2"])
        put_norm(f"{bp}.norm3", p["norm3"])
        put_attn(f"{bp}.attn1", p["attn1"])
        put_attn(f"{bp}.attn2", p["attn2"])
        put_lin(f"{bp}.ff.net.0.proj", p["ff_proj"])
        put_lin(f"{bp}.ff.net.2", p["ff_out"])

    def put_resnet(name, p):
        put_norm(f"{name}.norm1", p["norm1"])
        put_conv(f"{name}.conv1", p["conv1"])
        put_lin(f"{name}.time_emb_proj", p["time_emb_proj"])
        put_norm(f"{name}.norm2", p["norm2"])
        put_conv(f"{name}.conv2", p["conv2"])
        if "conv_shortcut" in p:
            put_conv(f"{name}.conv_shortcut", p["conv_shortcut"])

    put_conv("conv_in", tiny["conv_in"])
    put_conv("conv_out", tiny["conv_out"])
    put_norm("conv_norm_out", tiny["conv_norm_out"])
    put_lin("time_embedding.linear_1", tiny["time_embedding"]["linear_1"])
    put_lin("time_embedding.linear_2", tiny["time_embedding"]["linear_2"])
    for i, blk in enumerate(tiny["down_blocks"]):
        for j, r in enumerate(blk["resnets"]):
            put_resnet(f"down_blocks.{i}.resnets.{j}", r)
        if blk["attentions"]:
            for j, a in enumerate(blk["attentions"]):
                put_transformer(f"down_blocks.{i}.attentions.{j}", a)
        if "downsampler" in blk:
            put_conv(f"down_blocks.{i}.downsamplers.0.conv", blk["downsampler"])
    for j, r in enumerate(tiny["mid_block"]["resnets"]):
        put_resnet(f"mid_block.resnets.{j}", r)
    put_transformer("mid_block.attentions.0", tiny["mid_block"]["attentions"][0])
    for i, blk in enumerate(tiny["up_blocks"]):
        for j, r in enumerate(blk["resnets"]):
            put_resnet(f"up_blocks.{i}.resnets.{j}", r)
        if blk["attentions"]:
            for j, a in enumerate(blk["attentions"]):
                put_transformer(f"up_blocks.{i}.attentions.{j}", a)
        if "upsampler" in blk:
            put_conv(f"up_blocks.{i}.upsamplers.0.conv", blk["upsampler"])

    restored = convert_sd_unet(sd)
    # identical structure AND identical values
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-6),
        tiny, restored)


def test_gradient_flow(tiny):
    def loss(p):
        out = sd_unet_apply(p, jnp.ones((1, 27, 27, 4)), jnp.array([5]),
                            jnp.ones((1, 4, 20)), TINY)
        return jnp.mean(out ** 2)

    grads = jax.jit(jax.grad(loss))(tiny)
    norms = [float(jnp.linalg.norm(g)) for g in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(n) for n in norms)
    assert sum(n > 0 for n in norms) / len(norms) > 0.9
