"""Caption augmentation (data/caption_augment.py): the offline
substitute for pretrained-BERT wording generalization (VERDICT r3 #4)."""

from pathlib import Path

import numpy as np
import pytest

from psg_tpu.data.caption_augment import (augment_caption, caption_variants,
                                          split_sentences, strip_name)

CSV = Path("/root/reference/data/text_description_concat.csv")

CAP = ("Pokemon named Testmon. A squat green creature with dark spots. "
       "A thick seed bulb sits on its back. Its big eyes gleam. "
       "Sturdy legs end in claws. primary type is grass.")


def test_strip_name():
    assert strip_name(CAP).startswith("A squat green creature")
    # no name prefix -> unchanged
    assert strip_name("A plain caption.") == "A plain caption."


def test_split_sentences_roundtrip():
    sents = split_sentences(strip_name(CAP))
    assert len(sents) == 5
    assert sents[0] == "A squat green creature with dark spots."


def test_variants_deterministic_and_canonical_first():
    caps = [CAP, "Pokemon named Other. A red lizard. A flame tail."]
    a = caption_variants(caps, 6, seed=3)
    b = caption_variants(caps, 6, seed=3)
    assert a == b
    c = caption_variants(caps, 6, seed=4)
    assert a != c
    for i, vs in enumerate(a):
        assert len(vs) == 6
        assert vs[0] == caps[i]  # variant 0 canonical


def test_variants_only_recombine_original_sentences():
    vs = caption_variants([CAP], 16, seed=0)[0]
    orig = set(split_sentences(strip_name(CAP)))
    saw_name_drop = saw_reorder = False
    for v in vs[1:]:
        body = strip_name(v)
        if body == v:
            saw_name_drop = True
        sents = split_sentences(body)
        assert set(sents) <= orig           # no invented text
        assert len(sents) >= 2              # min_sentences
        if sents != [s for s in split_sentences(strip_name(CAP))
                     if s in sents]:
            saw_reorder = True
    assert saw_name_drop  # p=0.5 over 15 variants: ~always
    assert saw_reorder


def test_augment_caption_seeded():
    r1 = np.random.RandomState(7)
    r2 = np.random.RandomState(7)
    assert augment_caption(CAP, r1) == augment_caption(CAP, r2)


@pytest.mark.skipif(not CSV.exists(), reason="reference dataset not mounted")
def test_dataset_set_caption_variants_shapes():
    from psg_tpu.data.dataset import PokemonDataset
    from psg_tpu.text.tokenizer import WordPieceTokenizer

    ds = PokemonDataset(CSV, "/root/reference/data/small_images",
                        image_size=64, text_len=32)
    tok = WordPieceTokenizer.from_corpus(ds.full_descriptions[:50],
                                         max_size=200)
    ds.set_tokenizer(tok)
    ds.set_caption_variants(4, seed=1)
    n = len(ds)
    assert ds.text_ids_aug.shape == (n, 4, 32)
    assert ds.text_mask_aug.shape == (n, 4, 32)
    # variant 0 tokenizes identically to the canonical ids
    np.testing.assert_array_equal(ds.text_ids_aug[:, 0], ds.text_ids)


def test_name_drop_zero_keeps_every_name():
    """caption_name_drop=0 must preserve the 'Pokemon named X.' prefix in
    every variant (round 4: p=0.5 name drop collapsed retrieval@1 to 0)."""
    from psg_tpu.data.caption_augment import caption_variants

    descs = [
        "Pokemon named Bulbasaur. A green seed creature. It has a bulb.",
        "Pokemon named Pikachu. A yellow mouse. Red cheeks. Lightning tail.",
    ]
    out = caption_variants(descs, k=6, seed=3, p_name_drop=0.0)
    for vs in out:
        for v in vs:
            assert v.startswith("Pokemon named ")
    # default 0.5 drops some names somewhere (sanity that the knob matters)
    out_default = caption_variants(descs, k=6, seed=3)
    assert any(not v.startswith("Pokemon named ")
               for vs in out_default for v in vs[1:])
