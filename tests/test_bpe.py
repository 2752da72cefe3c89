"""CLIP BPE tokenizer tests.

Algorithm-level tests run on a synthetic vocab; a parity test against
transformers' CLIPTokenizer activates when the real vocab artifacts exist
(weights/clip_vocab.json + clip_merges.txt, exported by
scripts/fetch_and_convert.py)."""

import json
from pathlib import Path

import numpy as np
import pytest

from psg_tpu.text.bpe import ClipBPETokenizer, bytes_to_unicode

WEIGHTS = Path("weights")
HAVE_REAL = (WEIGHTS / "clip_vocab.json").exists() and (
    WEIGHTS / "clip_merges.txt").exists()


def _toy_tokenizer():
    # byte-level unigrams + word-final variants + a couple of merges
    byte_chars = list(bytes_to_unicode().values())
    vocab = {}
    for ch in byte_chars:
        vocab[ch] = len(vocab)
    for ch in byte_chars:
        vocab[ch + "</w>"] = len(vocab)
    merges = [("h", "i</w>"), ("l", "o</w>"), ("l", "lo</w>")]
    for a, b in merges:
        vocab[a + b] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    return ClipBPETokenizer(vocab, merges)


def test_merges_apply_in_rank_order():
    tok = _toy_tokenizer()
    # 'hi' -> merge (h, i</w>) -> single token
    ids = tok.encode("hi")
    assert len(ids) == 1
    assert ids[0] == tok.encoder["hi</w>"]
    # 'hello' -> h e l lo</w> (lo merge then l+lo merge)
    ids = tok.encode("hello")
    toks = {v: k for k, v in tok.encoder.items()}
    assert [toks[i] for i in ids] == ["h", "e", "llo</w>"]


def test_cleaning_lowercase_and_whitespace():
    tok = _toy_tokenizer()
    assert tok.encode("  HI  ") == tok.encode("hi")


def test_encode_batch_framing_and_padding():
    tok = _toy_tokenizer()
    ids, mask = tok.encode_batch(["hi", "hello"], length=8)
    assert ids.shape == (2, 8)
    assert ids[0, 0] == tok.sot_id
    assert ids[0, 2] == tok.eot_id
    assert mask[0].sum() == 3
    assert ids[0, 3:].sum() == 0  # zero padding


def test_truncation_keeps_eot():
    tok = _toy_tokenizer()
    ids, mask = tok.encode_batch(["hello hello hello hello"], length=5)
    assert ids[0, -1] == tok.eot_id
    assert mask[0].sum() == 5


@pytest.mark.skipif(not HAVE_REAL, reason="real CLIP vocab not dropped")
def test_parity_with_hf_clip_tokenizer():
    """Weight-gated: exact id parity with transformers' slow CLIPTokenizer
    on the Pokemon-style prompts."""
    from transformers import CLIPTokenizer

    tok = ClipBPETokenizer.from_files(WEIGHTS / "clip_vocab.json",
                                      WEIGHTS / "clip_merges.txt")
    hf = CLIPTokenizer(str(WEIGHTS / "clip_vocab.json"),
                       str(WEIGHTS / "clip_merges.txt"))
    prompts = [
        "Pokemon named Bulbasaur. A small green creature with a bulb.",
        "a dragon-like pokemon, 6'07\" tall, breathes fire!",
    ]
    ours, _ = tok.encode_batch(prompts, length=77)
    for i, p in enumerate(prompts):
        ref = hf(p, padding="max_length", truncation=True, max_length=77)
        np.testing.assert_array_equal(ours[i], np.asarray(ref["input_ids"]))
