"""Import-path tests: the reference's trained .pth checkpoints convert to
servable psg_tpu .ckpt files (scripts/import_reference_checkpoint.py).

The containers are synthesized with the reference's OWN model classes
(src/training/vae_trainer.py:515-533 shapes the stage-1 container;
improved_diffusion_trainer.py:620-636 the stage-2 one;
final_trainer.py:644-662 the stage-3 generator bundle), so the test pins
the real key layout end to end: torch.save -> import script -> load_params
-> forward parity.
"""

import importlib.util
import sys
import types
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REFERENCE.exists(),
                                reason="reference not mounted")

TEXT_DIM = 768


def _load_reference_module(name: str):
    path = REFERENCE / "src" / "models" / f"{name}.py"
    spec = importlib.util.spec_from_file_location(f"ref_import_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _tiny_hf_text_encoder():
    """A module with the reference TextEncoder's state-dict naming
    (bert.* / projection.* / layer_norm.*, text_encoder.py:33-51) but a
    local tiny BertModel — the real class downloads bert-base."""
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel

    hf_cfg = HFBertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                          num_attention_heads=2, intermediate_size=64,
                          max_position_embeddings=32)

    class TE(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.bert = BertModel(hf_cfg)
            self.projection = torch.nn.Linear(32, TEXT_DIM)
            self.layer_norm = torch.nn.LayerNorm(TEXT_DIM)

    torch.manual_seed(3)
    return TE().eval(), hf_cfg


def _import_and_load_vae(tmp_path):
    """Build the stage-1 container with the real PokemonVAE, run the import
    script, and load the result through the serving template path."""
    vae_mod = _load_reference_module("vae_decoder")
    torch.manual_seed(11)
    tv = vae_mod.PokemonVAE(latent_dim=8, text_dim=TEXT_DIM).eval()
    te, hf_cfg = _tiny_hf_text_encoder()

    pth = tmp_path / "vae_best_model.pth"
    torch.save({
        "vae_state_dict": tv.state_dict(),
        "text_encoder_state_dict": te.state_dict(),
        "epoch": 49, "best_val_loss": 0.07,
    }, pth)

    from scripts.import_reference_checkpoint import main

    rc = main(["--vae", str(pth), "--experiment-name", "imported",
               "--experiment-dir", str(tmp_path), "--schedule", "cosine"])
    assert rc == 0
    ckpt = (tmp_path / "imported_vae" / "checkpoints" / "vae_best_model.ckpt")
    assert ckpt.exists()
    return tv, te, hf_cfg, ckpt


def test_vae_container_import_roundtrip(tmp_path):
    tv, te, hf_cfg, ckpt = _import_and_load_vae(tmp_path)

    from psg_tpu.core.checkpoint import load_metadata, load_params
    from psg_tpu.core.initutil import jit_init
    from psg_tpu.models.bert import BertConfig
    from psg_tpu.models.text_encoder import text_encoder_apply, text_encoder_init
    from psg_tpu.models.vae import vae_decode, vae_init

    # schedule sidecar drives the serving CLI's --schedule auto
    assert load_metadata(ckpt)["config"]["model"]["beta_schedule"] == "cosine"

    cfg = BertConfig(vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
                     intermediate_size=64, max_position=32)
    key = jax.random.PRNGKey(0)
    tmpl = {"vae": jit_init(vae_init, key, 8, TEXT_DIM),
            "text": jit_init(text_encoder_init, key, cfg, TEXT_DIM)}
    params = load_params(ckpt, tmpl)

    # decode parity against the executing reference
    rng = np.random.RandomState(0)
    z = rng.randn(2, 8, 27, 27).astype(np.float32)
    text = rng.randn(2, 5, TEXT_DIM).astype(np.float32)
    with torch.no_grad():
        theirs = tv.decoder(torch.from_numpy(z), torch.from_numpy(text))
    ours = vae_decode(params["vae"], jnp.asarray(z.transpose(0, 2, 3, 1)),
                      jnp.asarray(text), compat_reshape=True)
    np.testing.assert_allclose(np.asarray(ours),
                               theirs.numpy().transpose(0, 2, 3, 1), atol=5e-3)

    # text-encoder parity (ids through both stacks)
    ids = rng.randint(0, 64, (2, 7)).astype(np.int64)
    mask = np.ones((2, 7), np.int64)
    with torch.no_grad():
        hidden = te.bert(input_ids=torch.from_numpy(ids),
                         attention_mask=torch.from_numpy(mask)).last_hidden_state
        theirs_t = te.layer_norm(te.projection(hidden))
    ours_t = text_encoder_apply(params["text"], jnp.asarray(ids),
                                jnp.asarray(mask), cfg)
    np.testing.assert_allclose(np.asarray(ours_t), theirs_t.numpy(), atol=2e-3)


@pytest.mark.slow
def test_diffusion_and_final_container_import(tmp_path):
    """Full-size reference UNet (640M at text_dim 256): the stage-2
    container and the stage-3 FinalPokemonGenerator bundle both convert
    and load into the serving templates."""
    unet_mod = _load_reference_module("unet")
    vae_mod = _load_reference_module("vae_decoder")
    torch.manual_seed(5)
    tu = unet_mod.UNet(latent_dim=8, text_dim=256).eval()

    pth = tmp_path / "diffusion_best_model.pth"
    torch.save({"unet_state_dict": tu.state_dict(), "epoch": 499}, pth)

    from scripts.import_reference_checkpoint import main

    rc = main(["--diffusion", str(pth), "--experiment-name", "imported",
               "--experiment-dir", str(tmp_path), "--schedule", "cosine"])
    assert rc == 0

    from psg_tpu.core.checkpoint import load_sample_params
    from psg_tpu.core.initutil import jit_init
    from psg_tpu.models.unet import UNetSpec, unet_init

    spec = UNetSpec(text_dim=256)
    tmpl = jit_init(unet_init, jax.random.PRNGKey(0), spec)
    params = load_sample_params(
        tmp_path / "imported_diffusion" / "checkpoints"
        / "diffusion_best_model.ckpt", tmpl)
    got = np.asarray(params["init_conv"]["w"])
    want = tu.init_conv.weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, atol=1e-6)
    del params, tmpl

    # stage-3 bundle: FinalPokemonGenerator submodule naming
    # (vae_encoder./vae_decoder./unet./text_encoder., final_trainer.py:97-146)
    te, _hf = _tiny_hf_text_encoder()
    torch.manual_seed(13)
    tv = vae_mod.PokemonVAE(latent_dim=8, text_dim=TEXT_DIM).eval()

    class Gen(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.vae_encoder = tv.encoder
            self.vae_decoder = tv.decoder
            self.unet = tu
            self.text_encoder = te

    fpth = tmp_path / "final_best_model.pth"
    torch.save({"model_state_dict": Gen().state_dict()}, fpth)
    rc = main(["--final", str(fpth), "--experiment-name", "imported",
               "--experiment-dir", str(tmp_path), "--schedule", "cosine"])
    assert rc == 0
    from psg_tpu.core.checkpoint import load_params
    from psg_tpu.models.bert import BertConfig
    from psg_tpu.models.text_encoder import text_encoder_init
    from psg_tpu.models.vae import vae_init

    cfg = BertConfig(vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
                     intermediate_size=64, max_position=32)
    key = jax.random.PRNGKey(0)
    tmpl = {"vae": jit_init(vae_init, key, 8, TEXT_DIM),
            "text": jit_init(text_encoder_init, key, cfg, TEXT_DIM),
            "unet": jit_init(unet_init, key, spec)}
    params = load_params(
        tmp_path / "imported_final" / "checkpoints" / "final_best_model.ckpt",
        tmpl)
    np.testing.assert_allclose(
        np.asarray(params["vae"]["decoder"]["latent_proj"]["w"]).ravel()[:8],
        tv.decoder.latent_proj.weight.detach().numpy()
        .transpose(2, 3, 1, 0).ravel()[:8], atol=1e-6)
