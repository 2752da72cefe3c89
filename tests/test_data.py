"""Data pipeline tests against the real reference dataset (read-only)."""

from pathlib import Path

import numpy as np
import pytest

from psg_tpu.data import PokemonDataset, Loader, dataset_statistics, split_indices
from psg_tpu.data.augment import augment_sprite
from psg_tpu.data.dataset import full_description, read_description_csv
from psg_tpu.text import WordPieceTokenizer

CSV = Path("/root/reference/data/text_description_concat.csv")
IMAGES = Path("/root/reference/data/small_images")

needs_data = pytest.mark.skipif(not CSV.exists(), reason="reference dataset not mounted")


@needs_data
def test_csv_parse():
    rows = read_description_csv(CSV)
    assert len(rows) == 898
    assert rows[0]["english_name"] == "Bulbasaur"
    assert rows[0]["national_number"] == 1
    assert "seed bulb" in rows[0]["description"]


def test_full_description_format():
    assert full_description("Pikachu", "Yellow mouse.") == (
        "Pokemon named Pikachu. Yellow mouse.."
    )  # reference joins with '. ' and appends '.' (dataset_improved.py:216-226)


@pytest.fixture(scope="module")
def ds():
    if not CSV.exists():
        pytest.skip("reference dataset not mounted")
    tok = WordPieceTokenizer.from_corpus(
        ["pokemon named test. a creature with green skin."])
    return PokemonDataset(CSV, IMAGES, tokenizer=tok, text_len=32)


@needs_data
def test_dataset_images(ds):
    assert len(ds) == 898
    assert ds.images.shape == (898, 215, 215, 3)
    assert ds.images.dtype == np.uint8
    img = ds.image_float(0)
    assert img.min() >= -1.0 and img.max() <= 1.0
    # white background where the sprite is transparent (corner pixel)
    assert (ds.images[0, 0, 0] == [255, 255, 255]).all()


@needs_data
def test_dataset_tokenized(ds):
    assert ds.text_ids.shape == (898, 32)
    assert ds.text_mask.shape == (898, 32)
    assert ds.text_mask[:, 0].all()  # CLS always present


def test_split_indices_deterministic_and_disjoint():
    tr, va, te = split_indices(898, 0.15, 0.05, seed=42)
    tr2, va2, te2 = split_indices(898, 0.15, 0.05, seed=42)
    np.testing.assert_array_equal(tr, tr2)
    assert len(te) == int(898 * 0.05)
    assert len(va) == int(898 * 0.15)
    assert len(tr) == 898 - len(va) - len(te)
    all_idx = np.concatenate([tr, va, te])
    assert len(np.unique(all_idx)) == 898


@needs_data
def test_train_loader_batches(ds):
    tr, _, _ = split_indices(len(ds), 0.15, 0.05)
    loader = Loader(ds, tr, batch_size=8, train=True, num_workers=2, augment=True)
    assert len(loader) == len(tr) // 8  # drop_last
    batch = next(iter(loader))
    assert batch["image"].shape == (8, 215, 215, 3)
    assert batch["image"].dtype == np.float32
    assert batch["text_ids"].shape == (8, 32)
    assert batch["valid"] == 8


@needs_data
def test_eval_loader_tail_padding(ds):
    _, va, _ = split_indices(len(ds), 0.15, 0.05)
    loader = Loader(ds, va[:10], batch_size=4, train=False, num_workers=1)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[-1]["valid"] == 2
    assert batches[-1]["image"].shape == (4, 215, 215, 3)


@needs_data
def test_loader_epoch_reproducibility(ds):
    tr, _, _ = split_indices(len(ds), 0.15, 0.05)
    def first_ids(seed):
        loader = Loader(ds, tr, batch_size=4, train=True, seed=seed,
                        num_workers=1, augment=False)
        return next(iter(loader))["national_number"]
    np.testing.assert_array_equal(first_ids(1), first_ids(1))
    assert not np.array_equal(first_ids(1), first_ids(2))


def test_augment_preserves_shape_and_dtype():
    rng = np.random.default_rng(0)
    img = (np.random.RandomState(0).rand(64, 64, 3) * 255).astype(np.uint8)
    out = augment_sprite(img, rng)
    assert out.shape == img.shape and out.dtype == np.uint8
    # augmentation actually changes the image
    assert not np.array_equal(out, img)


@needs_data
def test_statistics(ds):
    stats = dataset_statistics(ds)
    assert stats["total_samples"] == 898
    assert stats["description_length_stats"]["mean"] > 0
