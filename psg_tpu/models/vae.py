"""Text-conditioned convolutional VAE (215x215x3 <-> 27x27x8 latents).

TPU-native re-design of the reference VAE (src/models/vae_decoder.py):

- encoder (vae_decoder.py:76-101): Conv(3->32,k4,s2,p1)+ReLU+Res,
  Conv(32->64,k4,s2,p1)+ReLU+Res, Conv(64->128,k4,s2,p2)+ReLU+Res, then
  stride-1 ResNet blocks 128->256->256->512->512; two 3x3 convs produce
  mu/logvar.  Spatial path 215 -> 107 -> 53 -> 27 (the p=2 on the third
  conv is what makes 53 -> 27).
- decoder (vae_decoder.py:137-174): 3x3 conv latent->512, then five
  [ResNet, CrossAttention(text), ResNet] blocks with upsampling
  27 -> 54 -> 108 -> 215 (bilinear, align_corners=False -> half-pixel),
  channels 512->512->256->128->64->32, final GroupNorm(8,32)+SiLU+Conv+tanh.
- cross-attention is Q-from-pixels / K,V-from-text only
  (vae_decoder.py:49-65), 8 heads.

Differences from the reference (deliberate, TPU-first): NHWC layout, fp32
GroupNorm statistics, attention through the ops dispatch layer (Pallas flash
kernel on TPU for the 46k-query 215x215 block), explicit PRNG keys for the
reparameterization draw instead of global RNG state.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from psg_tpu.nn.attention import (
    spatial_cross_attention,
    spatial_cross_attention_init,
)
from psg_tpu.nn.layers import conv2d, conv2d_init, group_norm, group_norm_init
from psg_tpu.nn.resize import bilinear_resize

# ---------------------------------------------------------------------------
# ResNet block (VAE flavor: no time/text conditioning; GroupNorm(32))
# (reference: src/models/vae_decoder.py:8-31)
# ---------------------------------------------------------------------------


def resnet_block_init(key, cin: int, cout: int, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": group_norm_init(cin, dtype),
        "conv1": conv2d_init(ks[0], cin, cout, 3, init="torch", dtype=dtype),
        "norm2": group_norm_init(cout, dtype),
        "conv2": conv2d_init(ks[1], cout, cout, 3, init="torch", dtype=dtype),
    }
    if cin != cout:
        p["shortcut"] = conv2d_init(ks[2], cin, cout, 1, init="torch", dtype=dtype)
    return p


def resnet_block(params, x, *, dtype=None):
    from psg_tpu import ops
    from psg_tpu.nn.layers import largest_group_count

    residual = x
    # GroupNorm(32) at reference widths (all multiples of 32,
    # vae_decoder.py:13-16); the divisor rule generalizes to scaled widths
    h = ops.group_norm_silu(params["norm1"], x,
                            largest_group_count(x.shape[-1]), eps=1e-5)
    h = conv2d(params["conv1"], h, stride=1, padding=1, dtype=dtype)
    h = ops.group_norm_silu(params["norm2"], h,
                            largest_group_count(h.shape[-1]), eps=1e-5)
    h = conv2d(params["conv2"], h, stride=1, padding=1, dtype=dtype)
    if "shortcut" in params:
        residual = conv2d(params["shortcut"], residual, stride=1, padding=0, dtype=dtype)
    return h + residual


def latent_size_for(image_size: int) -> int:
    """Latent spatial size after the three stride-2 encoder convs
    (k4/p1, k4/p1, k4/p2 with torch floor semantics): 215 -> 27, 64 -> 9."""
    s = image_size // 2  # k4 s2 p1: floor((n-2)/2)+1 == n//2
    s = s // 2
    return s // 2 + 1    # k4 s2 p2: floor(n/2)+1


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

_ENC_DOWN = (  # (cin, cout, kernel, stride, pad)
    (3, 32, 4, 2, 1),   # 215 -> 107
    (32, 64, 4, 2, 1),  # 107 -> 53
    (64, 128, 4, 2, 2),  # 53 -> 27
)
_ENC_RES = ((128, 256), (256, 256), (256, 512), (512, 512))


def _w(c: int, scale: float) -> int:
    """Scale a channel width, keeping it a multiple of 8 (attention heads
    and GroupNorm divisors stay valid)."""
    if scale == 1.0:
        return c
    return max(8, int(round(c * scale / 8)) * 8)


def vae_encoder_init(key, latent_dim: int = 8, dtype=jnp.float32,
                     width_scale: float = 1.0):
    """``width_scale`` < 1 builds a proportionally narrower tower (tests,
    CPU dryruns); 1.0 is the reference architecture exactly."""
    ks = iter(jax.random.split(key, 16))
    s = width_scale
    p = {}
    for i, (cin, cout, k, _s, _pad) in enumerate(_ENC_DOWN):
        cin = cin if i == 0 else _w(cin, s)
        p[f"down{i}"] = conv2d_init(next(ks), cin, _w(cout, s), k,
                                    init="torch", dtype=dtype)
        p[f"res{i}"] = resnet_block_init(next(ks), _w(cout, s), _w(cout, s), dtype)
    for i, (cin, cout) in enumerate(_ENC_RES):
        p[f"deep{i}"] = resnet_block_init(next(ks), _w(cin, s), _w(cout, s), dtype)
    p["mu"] = conv2d_init(next(ks), _w(512, s), latent_dim, 3, init="torch", dtype=dtype)
    p["logvar"] = conv2d_init(next(ks), _w(512, s), latent_dim, 3, init="torch", dtype=dtype)
    return p


def vae_encoder_apply(params, images, *, dtype=None):
    """images: [B, 215, 215, 3] -> (mu, logvar), each [B, 27, 27, latent]."""
    x = images
    for i, (_cin, _cout, _k, s, pad) in enumerate(_ENC_DOWN):
        x = conv2d(params[f"down{i}"], x, stride=s, padding=pad, dtype=dtype)
        x = jax.nn.relu(x)
        x = resnet_block(params[f"res{i}"], x, dtype=dtype)
    for i in range(len(_ENC_RES)):
        x = resnet_block(params[f"deep{i}"], x, dtype=dtype)
    mu = conv2d(params["mu"], x, stride=1, padding=1, dtype=dtype)
    logvar = conv2d(params["logvar"], x, stride=1, padding=1, dtype=dtype)
    return mu, logvar


def reparameterize(key, mu, logvar):
    """latent = mu + eps * exp(0.5*logvar)  (vae_decoder.py:121-123)."""
    std = jnp.exp(0.5 * logvar.astype(jnp.float32))
    eps = jax.random.normal(key, mu.shape, jnp.float32)
    return (mu.astype(jnp.float32) + eps * std).astype(mu.dtype)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

_DEC_BLOCKS = (  # (cin, cout, upsample-target or None); sizes for 215 images
    (512, 512, None),        # 27x27
    (512, 256, "x2"),        # -> 54
    (256, 128, "x2"),        # -> 108
    (128, 64, "full"),       # -> 215 (exact-size bilinear, vae_decoder.py:161)
    (64, 32, None),          # 215
)


def vae_decoder_init(key, latent_dim: int = 8, text_dim: int = 768,
                     dtype=jnp.float32, width_scale: float = 1.0):
    ks = iter(jax.random.split(key, 32))
    s = width_scale
    p = {"latent_proj": conv2d_init(next(ks), latent_dim, _w(512, s), 3,
                                    init="torch", dtype=dtype)}
    for i, (cin, cout, _up) in enumerate(_DEC_BLOCKS):
        p[f"block{i}"] = {
            "res1": resnet_block_init(next(ks), _w(cin, s), _w(cout, s), dtype),
            "attn": spatial_cross_attention_init(next(ks), _w(cout, s), text_dim, dtype),
            "res2": resnet_block_init(next(ks), _w(cout, s), _w(cout, s), dtype),
        }
    p["final_norm"] = group_norm_init(_w(32, s), dtype)
    p["final_conv"] = conv2d_init(next(ks), _w(32, s), 3, 3, init="torch", dtype=dtype)
    return p


def vae_decoder_apply(params, latent, text_emb, *, text_bias=None,
                      image_size: int = 215, dtype=None,
                      compat_reshape: bool = False):
    """latent: [B, 27, 27, latent_dim], text_emb: [B, S, text_dim]
    -> images [B, image_size, image_size, 3] in [-1, 1]."""
    x = conv2d(params["latent_proj"], latent, stride=1, padding=1, dtype=dtype)
    for i, (_cin, _cout, up) in enumerate(_DEC_BLOCKS):
        bp = params[f"block{i}"]
        x = resnet_block(bp["res1"], x, dtype=dtype)
        x = spatial_cross_attention(
            bp["attn"], x, text_emb, num_heads=8, text_bias=text_bias,
            dtype=dtype, compat_reshape=compat_reshape,
        )
        x = resnet_block(bp["res2"], x, dtype=dtype)
        if up == "x2":
            h = x.shape[1]
            x = bilinear_resize(x, (h * 2, h * 2))
        elif up == "full":
            x = bilinear_resize(x, (image_size, image_size))
    from psg_tpu import ops

    x = ops.group_norm_silu(params["final_norm"], x, 8, eps=1e-5)
    x = conv2d(params["final_conv"], x, stride=1, padding=1, dtype=dtype)
    return jnp.tanh(x)


# ---------------------------------------------------------------------------
# Full VAE (mode semantics of PokemonVAE.forward, vae_decoder.py:236-269)
# ---------------------------------------------------------------------------


def vae_init(key, latent_dim: int = 8, text_dim: int = 768, dtype=jnp.float32,
             width_scale: float = 1.0):
    k1, k2 = jax.random.split(key)
    return {
        "encoder": vae_encoder_init(k1, latent_dim, dtype, width_scale),
        "decoder": vae_decoder_init(k2, latent_dim, text_dim, dtype, width_scale),
    }


def vae_encode(params, key, images, *, dtype=None):
    """Returns (latent, mu, logvar) like PokemonVAE.encode."""
    mu, logvar = vae_encoder_apply(params["encoder"], images, dtype=dtype)
    latent = reparameterize(key, mu, logvar)
    return latent, mu, logvar


def vae_decode(params, latent, text_emb, *, text_bias=None, dtype=None,
               image_size: int = 215, compat_reshape: bool = False):
    return vae_decoder_apply(
        params["decoder"], latent, text_emb, text_bias=text_bias,
        image_size=image_size, dtype=dtype, compat_reshape=compat_reshape,
    )


def vae_apply(params, key, images, text_emb, mode: str = "train", *,
              latent_dim: int = 8, latent_size: int = 27,
              image_size: int = None, text_bias=None,
              dtype=None, compat_reshape: bool = False):
    """Mode semantics from the reference:

    - 'train'/'val': encode + reparameterized sample + decode
    - 'generate':    encode, decode from the mean (deterministic)
    - 'sample':      decode from a prior N(0, I) draw (ignores images)
    """
    if mode == "sample" or images is None:
        b = text_emb.shape[0]
        latent = jax.random.normal(
            key, (b, latent_size, latent_size, latent_dim), jnp.float32
        )
        mu = logvar = None
    else:
        mu, logvar = vae_encoder_apply(params["encoder"], images, dtype=dtype)
        if mode == "generate":
            latent = mu
        else:
            latent = reparameterize(key, mu, logvar)
    if image_size is None:
        image_size = images.shape[1] if images is not None else 215
    recon = vae_decode(
        params, latent, text_emb, text_bias=text_bias, dtype=dtype,
        image_size=image_size, compat_reshape=compat_reshape,
    )
    return {"reconstructed": recon, "latent": latent, "mu": mu, "logvar": logvar}


def vae_sample(params, key, text_emb, *, latent_dim: int = 8,
               latent_size: int = 27, image_size: int = 215,
               text_bias=None, dtype=None):
    """Decode a prior draw (PokemonVAE.sample, vae_decoder.py:279-285)."""
    b = text_emb.shape[0]
    latent = jax.random.normal(key, (b, latent_size, latent_size, latent_dim))
    return vae_decode(params, latent, text_emb, text_bias=text_bias,
                      image_size=image_size, dtype=dtype)


def _smoke_test():  # pragma: no cover
    """`python -m psg_tpu.models.vae` — the analog of the reference's
    in-module test_vae (vae_decoder.py:288-313)."""
    import jax

    key = jax.random.PRNGKey(0)
    params = vae_init(key, latent_dim=8, text_dim=256)
    n = sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
    images = jax.random.normal(key, (2, 215, 215, 3))
    text = jax.random.normal(key, (2, 32, 256))
    out = jax.jit(lambda p, k, i, t: vae_apply(p, k, i, t, "train"))(
        params, key, images, text)
    print(f"params: {n:,}")
    print("reconstructed:", out["reconstructed"].shape)
    print("latent:", out["latent"].shape)
    assert out["reconstructed"].shape == images.shape
    assert out["latent"].shape == (2, 27, 27, 8)
    print("VAE smoke test passed")


if __name__ == "__main__":  # pragma: no cover
    _smoke_test()
