"""End-to-end stage-1 slice: real data -> jitted train step -> checkpoint.

Runs the full VAETrainer machinery at image_size=64 with a tiny BERT on a
16-sprite subset — every layer of the stack (data, text, model, loss,
optimizer, checkpoint) is exercised on the CPU backend in under a minute.
"""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from psg_tpu.core.config import Config
from psg_tpu.train.stage1_vae import VAETrainer

CSV = Path("/root/reference/data/text_description_concat.csv")
IMAGES = Path("/root/reference/data/small_images")

needs_data = pytest.mark.skipif(not CSV.exists(), reason="reference dataset not mounted")


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    if not CSV.exists():
        pytest.skip("reference dataset not mounted")
    tmp = tmp_path_factory.mktemp("exp")
    cfg = Config()
    cfg.experiment_dir = str(tmp)
    cfg.model.bert_model = "tiny-test"
    cfg.model.vae_width_scale = 0.25
    cfg.model.text_embedding_dim = 48
    cfg.data.csv_path = str(CSV)
    cfg.data.image_dir = str(IMAGES)
    cfg.data.image_size = 64
    cfg.data.batch_size = 2
    cfg.data.text_len = 32
    cfg.data.num_workers = 2
    cfg.training.vae_epochs = 1
    cfg.training.log_every = 1
    cfg.training.sample_every = 1
    t = VAETrainer(cfg, experiment_name="t")
    # shrink to a 16/4/2 subset for speed
    t.train_loader.indices = t.train_loader.indices[:16]
    t.val_loader.indices = t.val_loader.indices[:4]
    return t


@needs_data
def test_latent_size_derived(trainer):
    assert trainer.latent_size == 9  # 64 -> 32 -> 16 -> 9


@needs_data
@pytest.mark.slow
def test_train_loop_runs_and_checkpoints(trainer):
    best = trainer.train()
    assert best.exists()
    assert np.isfinite(trainer.best_val)
    assert int(trainer.state.step) == 8  # 16 samples / batch 2 * 1 epoch
    # sample grid written (sample_every=1)
    samples = list((trainer.stage_dir / "samples").glob("*.png"))
    assert samples, "no sample grid written"


@needs_data
def test_step_updates_params_and_is_finite(trainer):
    batch = next(iter(trainer.train_loader))
    b = {k: batch[k] for k in ("image", "text_ids", "text_mask")}
    # the step donates the state, so materialize the 'before' weights first
    before = np.asarray(trainer.state.params["vae"]["encoder"]["mu"]["w"])
    state2, parts = trainer._train_step(trainer.state, trainer.vgg_params, b, jnp.float32(0.001))
    after = np.asarray(state2.params["vae"]["encoder"]["mu"]["w"])
    assert np.isfinite(float(parts["total_loss"]))
    assert np.max(np.abs(before - after)) > 0.0
    trainer.state = state2


@needs_data
def test_checkpoint_roundtrip(trainer):
    from psg_tpu.core.checkpoint import load_state

    if not trainer.ckpt.best_path.exists():  # train() test may be slow-skipped
        trainer.save_checkpoint(0, 1.0)
    restored = load_state(trainer.ckpt.best_path, trainer.state)
    w0 = np.asarray(restored.params["vae"]["encoder"]["mu"]["w"])
    assert w0.shape == trainer.state.params["vae"]["encoder"]["mu"]["w"].shape


@needs_data
def test_frozen_bert_embeddings_unchanged(trainer):
    """finetune_strategy='minimal' freezes BERT embeddings; after training
    steps they must be bit-identical to init."""
    import jax

    from psg_tpu.core.initutil import jit_init
    from psg_tpu.models.text_encoder import text_encoder_init

    cfg = trainer.cfg
    # same jitted-init path as the trainer (eager init differs by ~1e-9
    # due to fusion in the RNG normal draw)
    init_text = jit_init(
        text_encoder_init, jax.random.split(jax.random.PRNGKey(cfg.seed), 4)[1],
        trainer.bert_cfg, cfg.model.text_embedding_dim)
    np.testing.assert_array_equal(
        np.asarray(init_text["bert"]["embeddings"]["word"]),
        np.asarray(trainer.state.params["text"]["bert"]["embeddings"]["word"]))
