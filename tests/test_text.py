"""Tokenizer + BERT text-encoder tests."""

import jax
import jax.numpy as jnp
import numpy as np

from psg_tpu.models.bert import BertConfig, bert_apply, bert_init
from psg_tpu.models.text_encoder import (
    finetune_mask,
    text_encoder_apply,
    text_encoder_init,
)
from psg_tpu.text import WordPieceTokenizer, build_vocab_from_corpus

CORPUS = [
    "A squat, dinosaur-like creature with smooth light green skin.",
    "Pokemon named Bulbasaur. A seed bulb sits on its back.",
    "Massive and imposing, with thick rough dark green skin.",
]


def _tok():
    return WordPieceTokenizer.from_corpus(CORPUS)


def test_vocab_contains_specials_and_words():
    vocab = build_vocab_from_corpus(CORPUS)
    assert vocab[:5] == ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    assert "green" in vocab and "skin" in vocab


def test_encode_shapes_and_framing():
    tok = _tok()
    ids, mask = tok.encode("light green skin", max_len=16)
    assert ids.shape == (16,) and mask.shape == (16,)
    assert ids[0] == tok.cls_id
    n = int(mask.sum())
    assert ids[n - 1] == tok.sep_id
    assert (ids[n:] == tok.pad_id).all()


def test_oov_word_falls_back_to_characters():
    tok = _tok()
    pieces = tok.tokenize("zzyzx")  # not in corpus -> char pieces
    assert len(pieces) >= 1
    assert all(p in tok.ids for p in pieces)


def test_roundtrip_decode():
    tok = _tok()
    ids, mask = tok.encode("light green skin", max_len=16)
    text = tok.decode(ids[: int(mask.sum())])
    assert "green" in text


def test_truncation():
    tok = _tok()
    long_text = " ".join(["skin"] * 100)
    ids, mask = tok.encode(long_text, max_len=8)
    assert int(mask.sum()) == 8
    assert ids[-1] == tok.sep_id


def test_vocab_save_load(tmp_path):
    tok = _tok()
    p = tmp_path / "vocab.txt"
    tok.save_vocab(p)
    tok2 = WordPieceTokenizer.from_vocab_file(p)
    a, _ = tok.encode("green skin", 8)
    b, _ = tok2.encode("green skin", 8)
    np.testing.assert_array_equal(a, b)


def test_bert_shapes_and_mask_invariance():
    cfg = BertConfig.tiny_test()
    key = jax.random.PRNGKey(0)
    params = bert_init(key, cfg)
    ids = jnp.array([[2, 10, 11, 3, 0, 0]], jnp.int32)
    mask = jnp.array([[1, 1, 1, 1, 0, 0]], jnp.int32)
    hidden, pooled = bert_apply(params, ids, mask, cfg)
    assert hidden.shape == (1, 6, cfg.hidden_size)
    assert pooled.shape == (1, cfg.hidden_size)

    # changing a PAD token's id must not change non-pad hidden states
    ids2 = ids.at[0, 5].set(99)
    hidden2, _ = bert_apply(params, ids2, mask, cfg)
    np.testing.assert_allclose(
        np.asarray(hidden[:, :4]), np.asarray(hidden2[:, :4]), atol=1e-5
    )


def test_text_encoder_projection_and_shape():
    cfg = BertConfig.tiny_test()
    key = jax.random.PRNGKey(1)
    params = text_encoder_init(key, cfg, text_dim=48)
    assert "projection" in params  # 32 != 48
    ids = jnp.zeros((2, 10), jnp.int32)
    mask = jnp.ones((2, 10), jnp.int32)
    out = text_encoder_apply(params, ids, mask, cfg)
    assert out.shape == (2, 10, 48)
    # identity-dim case has no projection
    p2 = text_encoder_init(key, cfg, text_dim=cfg.hidden_size)
    assert "projection" not in p2


def test_finetune_mask_strategies():
    cfg = BertConfig.tiny_test()
    params = text_encoder_init(jax.random.PRNGKey(2), cfg, text_dim=48)

    def frac_trainable(mask):
        leaves = jax.tree_util.tree_leaves(mask)
        return sum(leaves) / len(leaves)

    m_none = finetune_mask(params, cfg, "none")
    m_min = finetune_mask(params, cfg, "minimal")
    m_full = finetune_mask(params, cfg, "full")
    assert frac_trainable(m_none) < frac_trainable(m_min) < frac_trainable(m_full)
    assert frac_trainable(m_full) == 1.0
    # projection + ln always trainable
    assert all(jax.tree_util.tree_leaves(m_none["projection"]))
    assert all(jax.tree_util.tree_leaves(m_none["ln"]))
    # mask structure must match params structure
    jax.tree_util.tree_map(lambda a, b: None, params, m_min)
