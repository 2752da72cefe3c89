"""Native C++ augmentation engine tests (skipped when no compiler)."""

import numpy as np
import pytest

from psg_tpu.data import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _imgs(n=4, size=64):
    return (np.random.RandomState(0).rand(n, size, size, 3) * 255).astype(np.uint8)


def test_normalize_matches_python_path():
    img = _imgs()
    out = native.augment_batch(img, seed=1, augment=False)
    ref = img.astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_deterministic_and_seed_dependent():
    img = _imgs()
    a = native.augment_batch(img, seed=7)
    b = native.augment_batch(img, seed=7)
    c = native.augment_batch(img, seed=8)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_output_range_and_shape():
    img = _imgs(n=3, size=48)
    out = native.augment_batch(img, seed=3)
    assert out.shape == (3, 48, 48, 3) and out.dtype == np.float32
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_thread_count_invariance():
    img = _imgs(n=8)
    a = native.augment_batch(img, seed=5, num_threads=1)
    b = native.augment_batch(img, seed=5, num_threads=8)
    np.testing.assert_array_equal(a, b)


def test_augmented_differs_but_stats_similar():
    img = _imgs(n=8, size=96)
    out = native.augment_batch(img, seed=11)
    ref = img.astype(np.float32) / 127.5 - 1.0
    assert not np.allclose(out, ref, atol=1e-3)
    # jitter magnitudes are small; global stats stay in the same ballpark
    assert abs(out.mean() - ref.mean()) < 0.2
    # bilinear rotation/crop smooths white-noise test input substantially,
    # so allow a generous std drop (real sprites lose far less)
    assert abs(out.std() - ref.std()) < 0.4


def test_loader_uses_native(tmp_path):
    from pathlib import Path

    CSV = Path("/root/reference/data/text_description_concat.csv")
    if not CSV.exists():
        pytest.skip("reference dataset not mounted")
    from psg_tpu.data import Loader, PokemonDataset, split_indices

    ds = PokemonDataset(CSV, "/root/reference/data/small_images", image_size=64)
    tr, _, _ = split_indices(len(ds), 0.15, 0.05)
    loader = Loader(ds, tr[:8], batch_size=4, train=True, augment=True,
                    num_workers=2)
    batch = next(iter(loader))
    assert batch["image"].shape == (4, 64, 64, 3)
    assert batch["image"].dtype == np.float32
    assert np.isfinite(batch["image"]).all()
