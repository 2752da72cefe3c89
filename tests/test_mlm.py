"""Stage-0 MLM text-tower pretraining (train/stage0_mlm.py).

The zero-egress substitute for the reference's pretrained BERT download
(src/models/text_encoder.py:30-40) — see VERDICT r4 missing #3.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psg_tpu.core.config import Config

CSV = Path("/root/reference/data/text_description_concat.csv")

needs_data = pytest.mark.skipif(not CSV.exists(),
                                reason="reference dataset not mounted")


def _tiny_cfg(tmp) -> Config:
    cfg = Config()
    cfg.experiment_dir = str(tmp)
    cfg.model.bert_model = "tiny-test"
    cfg.model.text_embedding_dim = 48
    cfg.data.csv_path = str(CSV)
    cfg.data.image_dir = "/root/reference/data/small_images"
    cfg.data.image_size = 64
    cfg.data.text_len = 32
    cfg.extra = {"mlm_epochs": 3, "mlm_batch": 16, "mlm_caption_augment": 2}
    return cfg


def test_bert_masking_statistics():
    from psg_tpu.train.stage0_mlm import apply_bert_masking

    rng = jax.random.PRNGKey(0)
    ids = jnp.full((64, 32), 100, jnp.int32)
    mask = jnp.ones((64, 32), jnp.int32)
    mask = mask.at[:, 20:].set(0)  # padded tail
    masked, labels, sel = apply_bert_masking(rng, ids, mask, mask_id=4,
                                             vocab_size=1000)
    sel = np.asarray(sel)
    # padding never selected
    assert not sel[:, 20:].any()
    # ~15% of the 20 real positions selected
    frac = sel[:, :20].mean()
    assert 0.10 < frac < 0.20, frac
    # among selected: mostly [MASK], some random, some kept
    m, lab = np.asarray(masked), np.asarray(labels)
    chosen = m[sel]
    assert (chosen == 4).mean() > 0.6
    assert (chosen == 100).mean() > 0.02  # the kept 10%
    # unselected positions untouched; labels carry the original ids
    assert (m[~sel] == 100).all()
    assert (lab == 100).all()


@needs_data
@pytest.mark.slow
def test_mlm_pretrain_loss_drops_and_warm_starts_stage1(tmp_path):
    from psg_tpu.train.stage0_mlm import MLMPretrainer, load_text_init

    cfg = _tiny_cfg(tmp_path)
    t = MLMPretrainer(cfg, experiment_name="mlmtest")
    v0 = float(t._val_fn(t.state, t.val_rows))
    best = t.train()
    v1 = float(t._val_fn(t.state, t.val_rows))
    assert best.exists()
    assert v1 < v0, f"MLM val did not improve: {v0} -> {v1}"

    # the checkpoint's text subtree maps onto a fresh stage-1 template
    from psg_tpu.models.text_encoder import text_encoder_init
    from psg_tpu.train.stage1_vae import bert_config_for

    template = text_encoder_init(jax.random.PRNGKey(5),
                                 bert_config_for(cfg, t.tokenizer.vocab_size),
                                 cfg.model.text_embedding_dim)
    warm = load_text_init(best, template)
    got = np.asarray(warm["bert"]["embeddings"]["word"])
    want = np.asarray(t.state.params["text"]["bert"]["embeddings"]["word"])
    # best ckpt is from the best epoch, not necessarily the last state —
    # but shapes/dtypes must match and values must differ from the template
    assert got.shape == want.shape
    assert not np.allclose(
        got, np.asarray(template["bert"]["embeddings"]["word"]))
