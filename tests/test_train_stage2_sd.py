"""SD-path stage-2 trainer (--use-diffusers) end-to-end slice."""

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
    cfg.model.cross_attention_dim = 48  # match -> no projection branch
    cfg.model.num_timesteps = 50
    cfg.data.csv_path = str(CSV)
    cfg.data.image_dir = "/root/reference/data/small_images"
    cfg.data.image_size = 64
    cfg.data.batch_size = 2
    cfg.data.text_len = 32
    cfg.data.num_workers = 2
    cfg.training.diffusion_epochs = 1
    cfg.training.log_every = 2
    cfg.training.sample_every = 1
    return cfg


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    if not CSV.exists():
        pytest.skip("reference dataset not mounted")
    from psg_tpu.train.stage2_sd import SDDiffusionTrainer

    cfg = _tiny_cfg(tmp_path_factory.mktemp("expsd"))
    t = SDDiffusionTrainer(cfg, vae_checkpoint_path=None, experiment_name="t")
    t.train_loader.indices = t.train_loader.indices[:6]
    t.val_loader.indices = t.val_loader.indices[:2]
    return t


@needs_data
def test_spec_and_adapted_channels(trainer):
    assert trainer.spec.channels == (16, 24, 32, 32)
    # conv_in adapted 4 -> 8 latent channels
    assert trainer.state.params["sd"]["unet"]["conv_in"]["w"].shape[2] == 8
    assert trainer.state.params["sd"]["unet"]["conv_out"]["w"].shape[3] == 8


@needs_data
@pytest.mark.slow
def test_train_and_sample(trainer):
    text_before = np.asarray(trainer.state.params["text"]["ln"]["scale"])
    best = trainer.train()
    assert best.exists()
    assert int(trainer.state.step) == 3
    # the text encoder trains in this stage (unlike the custom-UNet stage 2)
    text_after = np.asarray(trainer.state.params["text"]["ln"]["scale"])
    assert np.abs(text_after - text_before).max() > 0
    assert list((trainer.stage_dir / "samples").glob("*.png"))


@needs_data
def test_cli_use_diffusers_routes_to_sd_trainer():
    from psg_tpu.train import cli

    # parser accepts the flag and stage 2 selects the SD trainer lazily
    args = cli.build_parser().parse_args(["--use-diffusers", "--stage", "2"])
    assert args.use_diffusers
