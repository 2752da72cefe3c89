"""Weight converters: torch state_dicts -> psg_tpu param pytrees.

Covers every pretrained dependency of the reference (SURVEY.md §2.5) plus
the reference's own checkpoints, so a user can bring torch weights into
the TPU framework:

- HF BERT (``BertModel``) -> models/bert.py params
- torchvision VGG16 ``features`` -> models/vgg.py params
- HF CLIP (``CLIPModel``, ViT-B/32) -> models/clip.py params
- reference ``PokemonVAE`` state_dict (src/models/vae_decoder.py)
- reference ``UNet`` state_dict (src/models/unet.py)
- reference ``TextEncoder`` state_dict (src/models/text_encoder.py)

Layout transforms: torch Conv2d OIHW -> HWIO (transpose 2,3,1,0); torch
Linear [out,in] -> [in,out] (transpose); nn.MultiheadAttention fused
in_proj [3C,C] -> [C,3C].

All functions take a ``state_dict``-like mapping of numpy arrays (use
``load_torch_state_dict`` for .pth files) and return fp32 jnp pytrees
matching the corresponding ``*_init`` structure exactly (tests assert
tree-structure equality and forward parity against torch).
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np


def load_torch_state_dict(path) -> Dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in obj.items()}


def _np(sd: Mapping, key: str) -> np.ndarray:
    v = sd[key]
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def _conv(sd, prefix):
    return {
        "w": jnp.asarray(_np(sd, f"{prefix}.weight").transpose(2, 3, 1, 0)),
        "b": jnp.asarray(_np(sd, f"{prefix}.bias")),
    }


def _linear(sd, prefix):
    return {
        "w": jnp.asarray(_np(sd, f"{prefix}.weight").T),
        "b": jnp.asarray(_np(sd, f"{prefix}.bias")),
    }


def _norm(sd, prefix):
    return {
        "scale": jnp.asarray(_np(sd, f"{prefix}.weight")),
        "bias": jnp.asarray(_np(sd, f"{prefix}.bias")),
    }


# ---------------------------------------------------------------------------
# BERT (HF naming: embeddings.*, encoder.layer.N.*, pooler.dense)
# ---------------------------------------------------------------------------


def convert_bert(sd: Mapping, num_layers: int, prefix: str = "") -> Dict:
    p = prefix
    out = {
        "embeddings": {
            "word": jnp.asarray(_np(sd, f"{p}embeddings.word_embeddings.weight")),
            "position": jnp.asarray(
                _np(sd, f"{p}embeddings.position_embeddings.weight")),
            "token_type": jnp.asarray(
                _np(sd, f"{p}embeddings.token_type_embeddings.weight")),
            "ln": _norm(sd, f"{p}embeddings.LayerNorm"),
        },
        "layers": [],
        "pooler": _linear(sd, f"{p}pooler.dense"),
    }
    for i in range(num_layers):
        lp = f"{p}encoder.layer.{i}."
        out["layers"].append({
            "attn": {
                "q": _linear(sd, lp + "attention.self.query"),
                "k": _linear(sd, lp + "attention.self.key"),
                "v": _linear(sd, lp + "attention.self.value"),
                "out": _linear(sd, lp + "attention.output.dense"),
                "ln": _norm(sd, lp + "attention.output.LayerNorm"),
            },
            "ffn": {
                "w1": _linear(sd, lp + "intermediate.dense"),
                "w2": _linear(sd, lp + "output.dense"),
                "ln": _norm(sd, lp + "output.LayerNorm"),
            },
        })
    return out


def convert_reference_text_encoder(sd: Mapping, num_layers: int,
                                   hidden: int, text_dim: int) -> Dict:
    """Reference TextEncoder: bert.* + projection + layer_norm
    (text_encoder.py:33-51)."""
    out = {"bert": convert_bert(sd, num_layers, prefix="bert."),
           "ln": _norm(sd, "layer_norm")}
    if hidden != text_dim:
        out["projection"] = _linear(sd, "projection")
    return out


# ---------------------------------------------------------------------------
# VGG16 features (torchvision indices 0..14)
# ---------------------------------------------------------------------------


def convert_vgg16(sd: Mapping, prefix: str = "features.") -> Dict:
    from psg_tpu.models.vgg import _CONVS

    return {
        f"conv{idx}": _conv(sd, f"{prefix}{idx}")
        for idx, _cin, _cout in _CONVS
    }


# ---------------------------------------------------------------------------
# Reference VAE (src/models/vae_decoder.py)
# ---------------------------------------------------------------------------


def _resnet(sd, prefix):
    out = {
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "conv1": _conv(sd, f"{prefix}.conv1"),
        "norm2": _norm(sd, f"{prefix}.norm2"),
        "conv2": _conv(sd, f"{prefix}.conv2"),
    }
    if f"{prefix}.shortcut.weight" in sd:
        out["shortcut"] = _conv(sd, f"{prefix}.shortcut")
    return out


def _spatial_attn(sd, prefix):
    return {
        "norm": _norm(sd, f"{prefix}.norm"),
        "q": _conv(sd, f"{prefix}.q"),
        "k": _linear(sd, f"{prefix}.k"),
        "v": _linear(sd, f"{prefix}.v"),
        "proj": _conv(sd, f"{prefix}.proj"),
    }


def convert_reference_vae(sd: Mapping) -> Dict:
    """PokemonVAE state_dict -> vae_init structure.

    Encoder Sequential indices (vae_decoder.py:76-97): convs at 0/3/6,
    ResNet at 2/5/8, deep ResNets at 9-12.  NOTE for inference parity: the
    reference decoder's K/V reshape scramble means converted weights need
    ``compat_reshape=True`` in vae_decode.
    """
    enc = {
        "down0": _conv(sd, "encoder.encoder.0"),
        "res0": _resnet(sd, "encoder.encoder.2"),
        "down1": _conv(sd, "encoder.encoder.3"),
        "res1": _resnet(sd, "encoder.encoder.5"),
        "down2": _conv(sd, "encoder.encoder.6"),
        "res2": _resnet(sd, "encoder.encoder.8"),
        "deep0": _resnet(sd, "encoder.encoder.9"),
        "deep1": _resnet(sd, "encoder.encoder.10"),
        "deep2": _resnet(sd, "encoder.encoder.11"),
        "deep3": _resnet(sd, "encoder.encoder.12"),
        "mu": _conv(sd, "encoder.mu_proj"),
        "logvar": _conv(sd, "encoder.logvar_proj"),
    }
    dec = {"latent_proj": _conv(sd, "decoder.latent_proj")}
    for i in range(5):
        dec[f"block{i}"] = {
            "res1": _resnet(sd, f"decoder.block{i+1}_resnet1"),
            "attn": _spatial_attn(sd, f"decoder.block{i+1}_attn"),
            "res2": _resnet(sd, f"decoder.block{i+1}_resnet2"),
        }
    dec["final_norm"] = _norm(sd, "decoder.final_conv.0")
    dec["final_conv"] = _conv(sd, "decoder.final_conv.2")
    return {"encoder": enc, "decoder": dec}


# ---------------------------------------------------------------------------
# Reference UNet (src/models/unet.py)
# ---------------------------------------------------------------------------


def _mha(sd, prefix):
    return {
        "in_proj": {
            "w": jnp.asarray(_np(sd, f"{prefix}.in_proj_weight").T),
            "b": jnp.asarray(_np(sd, f"{prefix}.in_proj_bias")),
        },
        "out_proj": _linear(sd, f"{prefix}.out_proj"),
    }


def _unet_resblock(sd, prefix):
    out = {
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "conv1": _conv(sd, f"{prefix}.conv1"),
        "time_proj": _linear(sd, f"{prefix}.time_proj"),
        "text_proj": _linear(sd, f"{prefix}.text_proj"),
        "norm2": _norm(sd, f"{prefix}.norm2"),
        "conv2": _conv(sd, f"{prefix}.conv2"),
    }
    if f"{prefix}.skip_conv.weight" in sd:
        out["skip"] = _conv(sd, f"{prefix}.skip_conv")
    return out


def _unet_attnblock(sd, prefix):
    return {
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "norm2": _norm(sd, f"{prefix}.norm2"),
        "self_attn": _mha(sd, f"{prefix}.self_attn"),
        "cross_attn": _mha(sd, f"{prefix}.cross_attn"),
        "text_proj": _linear(sd, f"{prefix}.text_proj"),
        "ffn1": _linear(sd, f"{prefix}.ffn.0"),
        "ffn2": _linear(sd, f"{prefix}.ffn.3"),
    }


def _unet_block(sd, prefix):
    out = {"res": _unet_resblock(sd, f"{prefix}.res_block")}
    if f"{prefix}.attn_block.norm1.weight" in sd:
        out["attn"] = _unet_attnblock(sd, f"{prefix}.attn_block")
    return out


def convert_reference_unet(sd: Mapping, levels: int = 4,
                           blocks_per_level: int = 2) -> Dict:
    out = {
        "time_mlp": {
            "l1": _linear(sd, "time_embed.time_mlp.0"),
            "l2": _linear(sd, "time_embed.time_mlp.2"),
            "l3": _linear(sd, "time_embed.time_mlp.4"),
        },
        "init_conv": _conv(sd, "init_conv"),
    }
    for lvl in range(levels):
        if lvl > 0:
            out[f"down{lvl}"] = _conv(sd, f"downsample{lvl}")
        out[f"enc{lvl}"] = [
            _unet_block(sd, f"enc_block{lvl}.{i}")
            for i in range(blocks_per_level)
        ]
    out["middle"] = _unet_block(sd, "middle_block")
    for lvl in range(levels):
        out[f"dec{lvl}"] = [
            _unet_block(sd, f"dec_block{lvl}.{i}")
            for i in range(blocks_per_level)
        ]
        if lvl > 0:
            out[f"up{lvl}"] = _conv(sd, f"upsample{lvl}.1")
    out["final_norm"] = _norm(sd, "final_conv.0")
    out["final_conv"] = _conv(sd, "final_conv.2")
    return out


# ---------------------------------------------------------------------------
# CLIP (HF CLIPModel naming)
# ---------------------------------------------------------------------------


def convert_clip(sd: Mapping, vision_layers: int = 12,
                 text_layers: int = 12) -> Dict:
    def block(lp):
        return {
            "ln1": _norm(sd, lp + "layer_norm1"),
            "q": _linear(sd, lp + "self_attn.q_proj"),
            "k": _linear(sd, lp + "self_attn.k_proj"),
            "v": _linear(sd, lp + "self_attn.v_proj"),
            "out": _linear(sd, lp + "self_attn.out_proj"),
            "ln2": _norm(sd, lp + "layer_norm2"),
            "mlp1": _linear(sd, lp + "mlp.fc1"),
            "mlp2": _linear(sd, lp + "mlp.fc2"),
        }

    patch_w = _np(sd, "vision_model.embeddings.patch_embedding.weight")
    # conv [W, 3, P, P] -> matmul over flattened patches laid out as
    # (row, col, channel) — matches clip_encode_image's reshape order
    cout, cin, ph, pw = patch_w.shape
    patch_mat = patch_w.transpose(2, 3, 1, 0).reshape(ph * pw * cin, cout)

    vision = {
        "patch": {"w": jnp.asarray(patch_mat)},
        "cls": jnp.asarray(_np(sd, "vision_model.embeddings.class_embedding")),
        "pos": jnp.asarray(
            _np(sd, "vision_model.embeddings.position_embedding.weight")),
        "ln_pre": _norm(sd, "vision_model.pre_layrnorm"),
        "blocks": [block(f"vision_model.encoder.layers.{i}.")
                   for i in range(vision_layers)],
        "ln_post": _norm(sd, "vision_model.post_layernorm"),
        "proj": jnp.asarray(_np(sd, "visual_projection.weight").T),
    }
    text = {
        "token": jnp.asarray(
            _np(sd, "text_model.embeddings.token_embedding.weight")),
        "pos": jnp.asarray(
            _np(sd, "text_model.embeddings.position_embedding.weight")),
        "blocks": [block(f"text_model.encoder.layers.{i}.")
                   for i in range(text_layers)],
        "ln_final": _norm(sd, "text_model.final_layer_norm"),
        "proj": jnp.asarray(_np(sd, "text_projection.weight").T),
    }
    return {"vision": vision, "text": text}


# ---------------------------------------------------------------------------
# diffusers UNet2DConditionModel (SD-1.5 naming) -> models/sd_unet.py
# ---------------------------------------------------------------------------


def convert_sd_unet(sd: Mapping, levels: int = 4,
                    layers_per_block: int = 2) -> Dict:
    """diffusers UNet2DConditionModel state_dict -> sd_unet_init structure.

    Covers the SD-1.5 topology (3x CrossAttnDown + Down, mid,
    Up + 3x CrossAttnUp, transformer depth 1).  The patch for
    ``proj_in``/``proj_out`` assumes use_linear_projection=False (SD-1.5).
    """

    def attention(lp):
        return {
            "to_q": {"w": jnp.asarray(_np(sd, lp + "to_q.weight").T)},
            "to_k": {"w": jnp.asarray(_np(sd, lp + "to_k.weight").T)},
            "to_v": {"w": jnp.asarray(_np(sd, lp + "to_v.weight").T)},
            "to_out": _linear(sd, lp + "to_out.0"),
        }

    def transformer(tp):
        bp = tp + "transformer_blocks.0."
        return {
            "norm": _norm(sd, tp + "norm"),
            "proj_in": _conv(sd, tp + "proj_in"),
            "norm1": _norm(sd, bp + "norm1"),
            "attn1": attention(bp + "attn1."),
            "norm2": _norm(sd, bp + "norm2"),
            "attn2": attention(bp + "attn2."),
            "norm3": _norm(sd, bp + "norm3"),
            "ff_proj": _linear(sd, bp + "ff.net.0.proj"),
            "ff_out": _linear(sd, bp + "ff.net.2"),
            "proj_out": _conv(sd, tp + "proj_out"),
        }

    def resnet(rp):
        out = {
            "norm1": _norm(sd, rp + "norm1"),
            "conv1": _conv(sd, rp + "conv1"),
            "time_emb_proj": _linear(sd, rp + "time_emb_proj"),
            "norm2": _norm(sd, rp + "norm2"),
            "conv2": _conv(sd, rp + "conv2"),
        }
        if rp + "conv_shortcut.weight" in sd:
            out["conv_shortcut"] = _conv(sd, rp + "conv_shortcut")
        return out

    p = {
        "conv_in": _conv(sd, "conv_in"),
        "time_embedding": {
            "linear_1": _linear(sd, "time_embedding.linear_1"),
            "linear_2": _linear(sd, "time_embedding.linear_2"),
        },
        "down_blocks": [],
        "up_blocks": [],
        "conv_norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }
    for lvl in range(levels):
        has_attn = lvl < levels - 1
        dp = f"down_blocks.{lvl}."
        blk = {
            "resnets": [resnet(dp + f"resnets.{j}.")
                        for j in range(layers_per_block)],
            "attentions": ([transformer(dp + f"attentions.{j}.")
                            for j in range(layers_per_block)]
                           if has_attn else None),
        }
        if f"{dp}downsamplers.0.conv.weight" in sd:
            blk["downsampler"] = _conv(sd, dp + "downsamplers.0.conv")
        p["down_blocks"].append(blk)

    p["mid_block"] = {
        "resnets": [resnet("mid_block.resnets.0."),
                    resnet("mid_block.resnets.1.")],
        "attentions": [transformer("mid_block.attentions.0.")],
    }
    for lvl in range(levels):
        has_attn = lvl > 0
        up = f"up_blocks.{lvl}."
        blk = {
            "resnets": [resnet(up + f"resnets.{j}.")
                        for j in range(layers_per_block + 1)],
            "attentions": ([transformer(up + f"attentions.{j}.")
                            for j in range(layers_per_block + 1)]
                           if has_attn else None),
        }
        if f"{up}upsamplers.0.conv.weight" in sd:
            blk["upsampler"] = _conv(sd, up + "upsamplers.0.conv")
        p["up_blocks"].append(blk)
    return p
