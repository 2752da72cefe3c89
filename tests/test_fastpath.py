"""Device-resident fast path: on-device augmentation semantics + the
stage-2 scanned-epoch trainer (train/fastpath.py, data/device_augment.py).
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psg_tpu.core.config import Config
from psg_tpu.data.device_augment import augment_batch, normalize_batch
from psg_tpu.train.fastpath import draw_minibatch, eval_batches

CSV = Path("/root/reference/data/text_description_concat.csv")
IMAGES = Path("/root/reference/data/small_images")

needs_data = pytest.mark.skipif(not CSV.exists(),
                                reason="reference dataset not mounted")


def test_augment_batch_shape_range_determinism():
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (4, 32, 32, 3), np.uint8)
    key = jax.random.PRNGKey(7)
    out = augment_batch(jnp.asarray(imgs), key)
    assert out.shape == (4, 32, 32, 3)
    assert out.dtype == jnp.float32
    o = np.asarray(out)
    assert o.min() >= -1.0 - 1e-6 and o.max() <= 1.0 + 1e-6
    # deterministic in the key; different keys -> different augmentation
    again = np.asarray(augment_batch(jnp.asarray(imgs), key))
    np.testing.assert_array_equal(o, again)
    other = np.asarray(augment_batch(jnp.asarray(imgs), jax.random.PRNGKey(8)))
    assert np.abs(o - other).max() > 1e-3


def test_augment_identity_bounds():
    """A constant image stays (nearly) constant: rotation/crop fill with
    the background and color jitter acts globally."""
    imgs = np.full((2, 24, 24, 3), 200, np.uint8)
    out = np.asarray(augment_batch(jnp.asarray(imgs), jax.random.PRNGKey(0),
                                   background_u8=(200, 200, 200)))
    # jitter scales shift the level but the image stays spatially uniform
    assert out.std(axis=(1, 2)).max() < 0.02


def test_normalize_batch_matches_host():
    imgs = np.arange(2 * 4 * 4 * 3, dtype=np.uint8).reshape(2, 4, 4, 3)
    dev = np.asarray(normalize_batch(jnp.asarray(imgs)))
    host = imgs.astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(dev, host, rtol=0, atol=1e-6)


def test_draw_minibatch_no_replacement():
    idx = np.asarray(draw_minibatch(jax.random.PRNGKey(3), 10, 8))
    assert len(np.unique(idx)) == 8
    assert idx.min() >= 0 and idx.max() < 10
    # full-split batch
    idx = np.asarray(draw_minibatch(jax.random.PRNGKey(3), 4, 8))
    np.testing.assert_array_equal(np.sort(idx), np.arange(4))


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
    cfg.data.num_workers = 1
    cfg.training.diffusion_epochs = 2
    cfg.training.sample_every = 1000
    cfg.training.save_every = 1000
    cfg.training.fast_path = True
    cfg.optimization.ema_decay = 0.9
    cfg.optimization.scheduler = "warmup_cosine"
    cfg.optimization.warmup_steps = 2
    cfg.optimization.skip_grad_norm = 1e6
    return cfg


@needs_data
@pytest.mark.slow
def test_stage2_fast_path_trains_with_ema(tmp_path):
    from psg_tpu.train.stage2_diffusion import DiffusionTrainer

    t = DiffusionTrainer(_tiny_cfg(tmp_path), vae_checkpoint_path=None,
                         experiment_name="fp")
    t.train_loader.indices = t.train_loader.indices[:8]
    t.val_loader.indices = t.val_loader.indices[:5]
    p0 = np.asarray(jax.tree_util.tree_leaves(t.state.params)[0]).copy()
    best = t.train()
    # 2 epochs x 4 scanned steps
    assert int(t.state.step) == 8
    assert best.exists()
    # params moved; EMA tracked and differs from both init and live params
    leaves = jax.tree_util.tree_leaves(t.state.params)
    e_leaves = jax.tree_util.tree_leaves(t.state.ema)
    assert np.abs(np.asarray(leaves[0]) - p0).max() > 0
    assert np.abs(np.asarray(e_leaves[0]) - np.asarray(leaves[0])).max() > 0
    assert np.isfinite(float(t.best_val))
    # sample_params prefers the EMA tree
    sp = t.state.sample_params
    assert sp is t.state.ema


@needs_data
@pytest.mark.slow
def test_stage2_fast_path_caption_augment(tmp_path):
    """Caption variants + cond-dropout: the r4 CFG recipe trains and the
    per-step variant draw changes nothing about shapes/finiteness."""
    from psg_tpu.train.stage2_diffusion import DiffusionTrainer

    cfg = _tiny_cfg(tmp_path)
    cfg.extra = {"caption_augment": 4, "cond_dropout": 0.25,
                 "snr_gamma": 5.0}
    t = DiffusionTrainer(cfg, vae_checkpoint_path=None, experiment_name="fpa")
    assert t.ds.text_ids_aug.shape[1] == 4
    t.train_loader.indices = t.train_loader.indices[:8]
    t.val_loader.indices = t.val_loader.indices[:5]
    best = t.train()
    assert int(t.state.step) == 8
    assert best.exists()
    assert np.isfinite(float(t.best_val))
    # the train split kept ids (not N*K precomputed embeddings) in HBM
    assert "text_emb" not in t._train_data
    assert "text_ids_aug" in t._train_data


@needs_data
@pytest.mark.slow
def test_stage1_fast_path_trains(tmp_path):
    from psg_tpu.train.stage1_vae import VAETrainer

    cfg = _tiny_cfg(tmp_path)
    cfg.training.vae_epochs = 2
    cfg.optimization.ema_decay = 0.0
    t = VAETrainer(cfg, experiment_name="fp1")
    t.train_loader.indices = t.train_loader.indices[:6]
    t.val_loader.indices = t.val_loader.indices[:3]
    best = t.train()
    assert int(t.state.step) == 6  # 2 epochs x 3 scanned steps
    assert best.exists()
    assert np.isfinite(float(t.best_val))


@needs_data
@pytest.mark.slow
def test_stage3_fast_path_phase_switch(tmp_path):
    from psg_tpu.train.stage3_final import FinalTrainer

    cfg = _tiny_cfg(tmp_path)
    cfg.training.final_epochs = 2
    cfg.training.phase1_epochs = 1
    cfg.optimization.ema_decay = 0.0
    t = FinalTrainer(cfg, vae_checkpoint_path=None,
                     diffusion_checkpoint_path=None, experiment_name="fp3")
    t.train_loader.indices = t.train_loader.indices[:6]
    t.val_loader.indices = t.val_loader.indices[:3]
    best = t.train()
    assert int(t.state.step) == 6
    assert t.phase == "joint"  # switch happened inside the fast loop
    assert best.exists()
    assert np.isfinite(float(t.best_val))


@needs_data
def test_eval_batches_padding_weights():
    from psg_tpu.data.dataset import PokemonDataset
    from psg_tpu.text import WordPieceTokenizer

    ds = PokemonDataset(CSV, IMAGES, image_size=64, text_len=16)
    tok = WordPieceTokenizer.from_corpus(ds.full_descriptions[:32])
    ds.set_tokenizer(tok)
    ev = eval_batches(ds, np.arange(5), batch_size=2)
    assert ev["images"].shape[:2] == (3, 2)
    w = np.asarray(ev["weight"])
    assert w.sum() == 5.0
    assert w[-1, -1] == 0.0


def test_device_augment_first_import_under_trace_then_retrace():
    """Regression: round-4 stage 3 crashed at the joint-phase re-jit with
    an UnexpectedTracerError because device_augment was first imported
    INSIDE a jit trace (module-level jnp constants become tracers of that
    trace, then leak into the next one).  Simulate the first-import-under-
    trace by evicting the module, trace once, then trace again."""
    import sys

    import jax
    import jax.numpy as jnp

    sys.modules.pop("psg_tpu.data.device_augment", None)

    def f(imgs, key):
        from psg_tpu.data.device_augment import augment_batch

        return augment_batch(imgs, key)

    imgs = jnp.zeros((2, 16, 16, 3), jnp.uint8)
    key = jax.random.PRNGKey(0)
    a = jax.jit(f)(imgs, key)                     # first trace imports the module
    b = jax.jit(lambda i, k: f(i, k) * 2.0)(imgs, key)  # re-trace reuses constants
    assert jnp.isfinite(a).all() and jnp.isfinite(b).all()


@needs_data
def test_caption_augment_classic_path_uses_variants(tmp_path):
    """extra.caption_augment now works on the classic path too: the host
    loader substitutes per-sample variant rows (VERDICT r4 #6 lifted the
    round-4 NotImplementedError guard), so train batches must carry
    augmented text_ids while eval batches stay canonical."""
    import numpy as np

    from psg_tpu.train.stage2_diffusion import DiffusionTrainer

    cfg = _tiny_cfg(tmp_path)
    cfg.training.fast_path = False
    cfg.extra = {"caption_augment": 4}
    t = DiffusionTrainer(cfg, vae_checkpoint_path=None, experiment_name="fpc")
    batch = next(iter(t.train_loader))
    idxs = batch["national_number"] - 1
    # (1/4)^batch chance of all-canonical draws
    assert not np.array_equal(batch["text_ids"], t.ds.text_ids[idxs])
    vb = next(iter(t.val_loader))
    np.testing.assert_array_equal(vb["text_ids"],
                                  t.ds.text_ids[vb["national_number"] - 1])
