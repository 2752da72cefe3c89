"""Cross-stage checkpoint hand-off (the path the 3-stage CLI exercises).

Regression test for a real bug: stage 2 restoring a stage-1 checkpoint
must not require stage 1's optimizer-state STRUCTURE (core.checkpoint.
load_params restores the params subtree structure-free)."""

from pathlib import Path

import numpy as np
import pytest

from psg_tpu.core.config import Config

CSV = Path("/root/reference/data/text_description_concat.csv")

needs_data = pytest.mark.skipif(not CSV.exists(), reason="reference dataset not mounted")


def _tiny_cfg(tmp) -> Config:
    cfg = Config()
    cfg.experiment_dir = str(tmp)
    cfg.model.bert_model = "tiny-test"
    cfg.model.vae_width_scale = 0.25
    cfg.model.text_embedding_dim = 48
    cfg.model.unet_channels = (16, 24, 32, 32)
    cfg.model.num_attention_heads = 4
    cfg.model.time_emb_dim = 32
    cfg.model.num_timesteps = 50
    cfg.data.csv_path = str(CSV)
    cfg.data.image_dir = "/root/reference/data/small_images"
    cfg.data.image_size = 64
    cfg.data.batch_size = 2
    cfg.data.text_len = 32
    cfg.data.num_workers = 2
    cfg.training.vae_epochs = 1
    cfg.training.diffusion_epochs = 1
    cfg.training.log_every = 100
    cfg.training.sample_every = 100
    return cfg


@needs_data
@pytest.mark.slow
def test_stage1_to_stage2_to_serve_handoff(tmp_path):
    from psg_tpu.train.stage1_vae import VAETrainer
    from psg_tpu.train.stage2_diffusion import DiffusionTrainer

    cfg = _tiny_cfg(tmp_path)
    t1 = VAETrainer(cfg, experiment_name="h")
    t1.train_loader.indices = t1.train_loader.indices[:4]
    t1.val_loader.indices = t1.val_loader.indices[:2]
    vae_best = t1.train()
    assert vae_best.exists()
    trained_mu = np.asarray(t1.state.params["vae"]["encoder"]["mu"]["w"])

    t2 = DiffusionTrainer(cfg, vae_checkpoint_path=str(vae_best),
                          experiment_name="h")
    # the frozen VAE must be stage-1's TRAINED weights, not a fresh init
    np.testing.assert_array_equal(
        np.asarray(t2.frozen["vae"]["encoder"]["mu"]["w"]), trained_mu)

    t2.train_loader.indices = t2.train_loader.indices[:4]
    t2.val_loader.indices = t2.val_loader.indices[:2]
    diff_best = t2.train()
    assert diff_best.exists()

    # stage 3 load path
    from psg_tpu.train.stage3_final import FinalTrainer

    t3 = FinalTrainer(cfg, vae_checkpoint_path=str(vae_best),
                      diffusion_checkpoint_path=str(diff_best),
                      experiment_name="h")
    np.testing.assert_array_equal(
        np.asarray(t3.state.params["vae"]["encoder"]["mu"]["w"]), trained_mu)
    np.testing.assert_array_equal(
        np.asarray(t3.state.params["unet"]["init_conv"]["w"]),
        np.asarray(t2.state.params["init_conv"]["w"]))

    # serving load path
    from psg_tpu.serve.generator import PokemonGenerator

    gen = PokemonGenerator(cfg, vae_checkpoint=str(vae_best),
                           diffusion_checkpoint=str(diff_best))
    np.testing.assert_array_equal(
        np.asarray(gen.params["vae"]["encoder"]["mu"]["w"]), trained_mu)
    # (generation itself is covered by test_serve.py — skipping the extra
    # chain compile keeps this test's runtime sane)


def test_load_serving_params_pair_bundle_and_absent(tmp_path):
    """core.checkpoint.load_serving_params handles every shape hub
    resolution can return.  Regression for a review finding: bench's old
    pair-only loader raised on a stage-3 'final' bundle (vae_ck ==
    diff_ck carrying {vae,text,unet}) and silently benched a random UNet
    under the 'best trained checkpoint pair' banner."""
    from psg_tpu.core.checkpoint import load_serving_params, save_state

    tmpl = {"vae": {"w": np.zeros((2, 2), np.float32)},
            "text": {"w": np.zeros(3, np.float32)},
            "unet": {"k": np.zeros(4, np.float32)}}

    vae_ck = tmp_path / "vae_best_model.ckpt"
    save_state(vae_ck, {"params": {"vae": {"w": np.full((2, 2), 1.0)},
                                   "text": {"w": np.full(3, 2.0)}}})
    diff_ck = tmp_path / "diffusion_best_model.ckpt"
    save_state(diff_ck, {"params": {"k": np.full(4, 3.0)},
                         "ema": {"k": np.full(4, 4.0)}})

    # stage-1/2 pair: vae+text from stage 1, EMA-preferred unet from stage 2
    p, tag = load_serving_params(vae_ck, diff_ck, tmpl)
    assert tag == "pair"
    np.testing.assert_array_equal(np.asarray(p["vae"]["w"]), 1.0)
    np.testing.assert_array_equal(np.asarray(p["text"]["w"]), 2.0)
    np.testing.assert_array_equal(np.asarray(p["unet"]["k"]), 4.0)  # EMA

    # stage-3 final bundle: one checkpoint carries all three subtrees
    fin = tmp_path / "final_best_model.ckpt"
    save_state(fin, {"params": {"vae": {"w": np.full((2, 2), 5.0)},
                                "text": {"w": np.full(3, 6.0)},
                                "unet": {"k": np.full(4, 7.0)}}})
    p, tag = load_serving_params(fin, fin, tmpl)
    assert tag == "final-bundle"
    np.testing.assert_array_equal(np.asarray(p["vae"]["w"]), 5.0)
    np.testing.assert_array_equal(np.asarray(p["unet"]["k"]), 7.0)

    # absent paths leave the template untouched, reported honestly
    p, tag = load_serving_params(None, None, tmpl)
    assert tag == "none"
    np.testing.assert_array_equal(np.asarray(p["unet"]["k"]), 0.0)
    p, tag = load_serving_params(vae_ck, tmp_path / "missing.ckpt", tmpl)
    assert tag == "vae-only"
    np.testing.assert_array_equal(np.asarray(p["vae"]["w"]), 1.0)
    np.testing.assert_array_equal(np.asarray(p["unet"]["k"]), 0.0)
