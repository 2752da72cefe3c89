"""End-to-end stage-2 slice: stage-1 checkpoint -> frozen encode ->
UNet diffusion training -> fast-DDPM sample grid."""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from psg_tpu.core.config import Config
from psg_tpu.train.stage2_diffusion import (
    DiffusionTrainer,
    unet_spatial_for,
    unet_spec_from_config,
)

CSV = Path("/root/reference/data/text_description_concat.csv")
IMAGES = Path("/root/reference/data/small_images")

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
    cfg.data.csv_path = str(CSV)
    cfg.data.image_dir = str(IMAGES)
    cfg.data.image_size = 64
    cfg.data.batch_size = 2
    cfg.data.text_len = 32
    cfg.data.num_workers = 2
    cfg.training.diffusion_epochs = 1
    cfg.training.log_every = 2
    cfg.training.sample_every = 1
    return cfg


def test_unet_spatial_for():
    assert unet_spatial_for(27) == (27, 14, 7, 4)
    assert unet_spatial_for(9) == (9, 5, 3, 2)


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    if not CSV.exists():
        pytest.skip("reference dataset not mounted")
    tmp = tmp_path_factory.mktemp("exp2")
    cfg = _tiny_cfg(tmp)
    t = DiffusionTrainer(cfg, vae_checkpoint_path=None, experiment_name="t")
    t.train_loader.indices = t.train_loader.indices[:8]
    t.val_loader.indices = t.val_loader.indices[:4]
    return t


@needs_data
def test_spec_from_config(trainer):
    spec = unet_spec_from_config(trainer.cfg, trainer.latent_size)
    assert spec.spatial == (9, 5, 3, 2)
    assert spec.channels == (16, 24, 32, 32)


@needs_data
@pytest.mark.slow
def test_train_and_sample(trainer):
    best = trainer.train()
    assert best.exists()
    assert int(trainer.state.step) == 4  # 8 samples / batch 2
    assert trainer.skipped_batches() == 0
    samples = list((trainer.stage_dir / "samples").glob("*.png"))
    assert samples


@needs_data
def test_onecycle_schedule_selected_for_cosine(tmp_path):
    cfg = _tiny_cfg(tmp_path)
    cfg.optimization.scheduler = "cosine"
    t = DiffusionTrainer(cfg, vae_checkpoint_path=None, experiment_name="t2")
    # OneCycle starts well below peak (warmup)
    from psg_tpu.train.optim import make_lr_schedule

    sched = make_lr_schedule("onecycle", 1e-3, total_steps=100, pct_start=0.1)
    assert float(sched(0)) < 1e-3 / 2
    assert float(sched(10)) == pytest.approx(1e-3, rel=1e-3)
    assert float(sched(99)) < 1e-4


@needs_data
def test_val_loss_ignores_padded_tail(trainer):
    """Eval masks wraparound-padded tail samples: corrupting the padding
    must not change the reported loss, while corrupting a valid sample
    must (VERDICT r1 weak #3 regression)."""
    batch = next(iter(trainer.val_loader))
    b = {k: batch[k] for k in ("image", "text_ids", "text_mask")}
    valid = jnp.int32(1)  # treat only sample 0 as real

    base = float(trainer._eval_step(trainer.state, trainer.frozen, b, valid)["loss"])

    corrupted = dict(b)
    img = np.array(b["image"])
    img[1:] = 0.77  # garbage in the "padded" tail
    corrupted["image"] = img
    tail = float(trainer._eval_step(trainer.state, trainer.frozen, corrupted,
                                    valid)["loss"])
    assert tail == pytest.approx(base, rel=1e-5)

    corrupted2 = dict(b)
    img2 = np.array(b["image"])
    img2[0] = 0.77  # garbage in the valid sample
    corrupted2["image"] = img2
    head = float(trainer._eval_step(trainer.state, trainer.frozen, corrupted2,
                                    valid)["loss"])
    assert head != pytest.approx(base, rel=1e-5)


@needs_data
def test_frozen_params_not_in_opt_state(trainer):
    # optimizer state must only cover the UNet params
    import jax

    n_opt_leaves = len(jax.tree_util.tree_leaves(trainer.state.opt_state))
    n_unet_leaves = len(jax.tree_util.tree_leaves(trainer.state.params))
    assert n_opt_leaves <= 2 * n_unet_leaves + 10


@needs_data
def test_norm_skip_counter_surfaces_in_skipped_batches(tmp_path):
    """skip_above_global_norm rejections must show in skipped_batches():
    at threshold 0.5 the r3 evidence run silently zeroed most healthy
    steps while logging 'skipped 0' (only apply_if_finite's NaN counter
    was read)."""
    import jax

    cfg = _tiny_cfg(tmp_path)
    cfg.optimization.skip_grad_norm = 1e-12  # reject every real gradient
    t = DiffusionTrainer(cfg, vae_checkpoint_path=None, experiment_name="ns")
    t.train_loader.indices = t.train_loader.indices[:2]

    batch = next(iter(t.train_loader))
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if k in ("image", "text_ids", "text_mask")}
    before = jax.tree_util.tree_map(lambda x: np.array(x), t.state.params)
    t.state, _ = t._train_step(t.state, t.frozen, batch)
    assert t.skipped_batches() == 1
    # the rejected step must leave params untouched
    after = t.state.params
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.array(a) - b))), after, before)
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0


@needs_data
def test_mu_dtype_bf16_optimizer_state(tmp_path):
    """optimization.mu_dtype='bfloat16' must thread through to the Adam
    first moment (the stage-2 + EMA HBM fit depends on it)."""
    import jax

    cfg = _tiny_cfg(tmp_path)
    cfg.optimization.mu_dtype = "bfloat16"
    t = DiffusionTrainer(cfg, vae_checkpoint_path=None, experiment_name="mu")
    dtypes = {str(x.dtype) for x in jax.tree_util.tree_leaves(t.state.opt_state)
              if hasattr(x, "dtype")}
    assert "bfloat16" in dtypes


@needs_data
def test_cond_dropout_zeroes_text_conditioning(tmp_path):
    """extra.cond_dropout=1.0 must make the train loss identical to the
    loss under a zero text embedding (the unconditional CFG branch)."""
    import jax

    cfg = _tiny_cfg(tmp_path)
    cfg.extra = {"cond_dropout": 1.0}
    t = DiffusionTrainer(cfg, vae_checkpoint_path=None, experiment_name="cd")
    batch = next(iter(t.train_loader))
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if k in ("image", "text_ids", "text_mask")}
    rng = jax.random.PRNGKey(0)

    dropped = t._noise_loss(t.state.params, t.frozen, batch, rng, train=True)

    # manually zero the embedding with dropout off
    t.cond_dropout = 0.0
    from psg_tpu.models.text_encoder import text_encoder_apply

    text_emb = text_encoder_apply(t.frozen["text"], batch["text_ids"],
                                  batch["text_mask"], t.bert_cfg,
                                  dtype=t.compute_dtype)
    manual = t._noise_loss_emb(t.state.params, t.frozen["vae"], batch["image"],
                               jnp.zeros_like(text_emb), batch["text_mask"],
                               rng, train=True)
    assert float(dropped) == pytest.approx(float(manual), rel=1e-5)


@needs_data
def test_snr_gamma_reweights_loss(tmp_path):
    """min-SNR-gamma weighting must change the train loss but leave the
    eval loss (train=False) untouched."""
    cfg = _tiny_cfg(tmp_path)
    cfg.extra = {"snr_gamma": 5.0}
    t = DiffusionTrainer(cfg, vae_checkpoint_path=None, experiment_name="sg")
    batch = next(iter(t.train_loader))
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if k in ("image", "text_ids", "text_mask")}
    import jax

    rng = jax.random.PRNGKey(0)
    weighted = float(t._noise_loss(t.state.params, t.frozen, batch, rng,
                                   train=True))
    t.snr_gamma = 0.0
    plain = float(t._noise_loss(t.state.params, t.frozen, batch, rng,
                                train=True))
    assert weighted != pytest.approx(plain)
    # min(snr,gamma)/snr <= 1 everywhere => weighted loss is smaller
    assert weighted < plain


def test_v_prediction_trains_and_samples(tmp_path):
    """extra.prediction_type='v' (VERDICT r5 #3): the step regresses the
    velocity target (loss differs from the eps run on identical
    inputs/params), min-SNR uses the v-form weight, and the sample path
    converts v->eps (finite images)."""
    import jax

    cfg = _tiny_cfg(tmp_path)
    cfg.extra = {"prediction_type": "v", "snr_gamma": 5.0}
    t = DiffusionTrainer(cfg, vae_checkpoint_path=None, experiment_name="vp")
    assert t.pred_type == "v"
    batch = next(iter(t.train_loader))
    b = {k: jnp.asarray(batch[k]) for k in ("image", "text_ids", "text_mask")}
    state2, parts = t._train_step(t.state, t.frozen, b)
    t.state = state2  # the step donates its input state's buffers
    assert np.isfinite(float(parts["loss"]))

    cfg_e = _tiny_cfg(tmp_path / "eps")
    cfg_e.extra = {"snr_gamma": 5.0}
    te = DiffusionTrainer(cfg_e, vae_checkpoint_path=None,
                          experiment_name="ep")
    _, parts_e = te._train_step(te.state, te.frozen, b)
    assert float(parts["loss"]) != pytest.approx(float(parts_e.get("loss")))

    ids, mask = t.tokenizer.encode_batch(
        t.ds.full_descriptions[:2], cfg.data.text_len)
    imgs = t._sample_fn(t.state.sample_params, t.frozen,
                        jax.random.PRNGKey(0), jnp.asarray(ids),
                        jnp.asarray(mask), num=2, sampler="ddim", steps=3)
    assert np.isfinite(np.asarray(imgs)).all()

    with pytest.raises(ValueError, match="prediction_type"):
        bad = _tiny_cfg(tmp_path / "bad")
        bad.extra = {"prediction_type": "x0"}
        DiffusionTrainer(bad, vae_checkpoint_path=None, experiment_name="b")
