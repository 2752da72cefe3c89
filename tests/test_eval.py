"""Sprite-quality / conditioning metrics (psg_tpu.eval)."""

import numpy as np
import pytest

from psg_tpu.eval import (
    color_histogram_similarity,
    conditioning_report,
    downsampled_l1,
    pairwise_conditioning_scores,
    silhouette_iou,
)


def _sprite(color, size=64, radius=20, bg=1.0):
    """Flat-background image with a centered square 'sprite'."""
    img = np.full((size, size, 3), bg, np.float32)
    c = size // 2
    img[c - radius:c + radius, c - radius:c + radius] = np.asarray(
        color, np.float32)
    return img


def test_identical_sprites_score_perfect():
    a = _sprite((0.8, -0.2, -0.9))
    assert silhouette_iou(a, a) == pytest.approx(1.0)
    assert color_histogram_similarity(a, a) == pytest.approx(1.0)
    assert downsampled_l1(a, a) == pytest.approx(0.0, abs=1e-6)


def test_blank_images_iou_defined():
    blank = np.ones((32, 32, 3), np.float32)
    assert silhouette_iou(blank, blank) == 1.0


def test_different_palettes_score_low():
    red = _sprite((1.0, -1.0, -1.0))
    green = _sprite((-1.0, 1.0, -1.0))
    assert color_histogram_similarity(red, green) < 0.1
    # same silhouette though
    assert silhouette_iou(red, green) == pytest.approx(1.0)


def test_different_silhouettes():
    small = _sprite((0.0, 0.0, 0.0), radius=8)
    large = _sprite((0.0, 0.0, 0.0), radius=24)
    iou = silhouette_iou(small, large)
    assert iou == pytest.approx((16 * 16) / (48 * 48), rel=1e-3)


def test_conditioning_report_detects_matched_pairs():
    colors = [(1.0, -1.0, -1.0), (-1.0, 1.0, -1.0), (-1.0, -1.0, 1.0),
              (0.9, 0.9, -1.0)]
    real = [_sprite(c) for c in colors]
    # "generations": noisy versions of the matching sprite
    rng = np.random.RandomState(0)
    gen = [np.clip(r + rng.uniform(-0.05, 0.05, r.shape).astype(np.float32),
                   -1, 1) for r in real]
    rep = conditioning_report(gen, real, names=list("abcd"))
    assert rep["retrieval_at_1"] == 1.0
    assert rep["margin"] > 0.1
    assert rep["matched_mean"] > rep["mismatched_mean"]
    assert set(rep["per_sprite"]) == set("abcd")


def test_conditioning_report_chance_for_unconditioned():
    """Identical generations regardless of caption -> no margin."""
    real = [_sprite(c) for c in
            [(1.0, -1.0, -1.0), (-1.0, 1.0, -1.0), (-1.0, -1.0, 1.0)]]
    same = _sprite((0.2, 0.2, 0.2))
    rep = conditioning_report([same] * 3, real)
    assert rep["margin"] == pytest.approx(0.0, abs=1e-9)


def test_retrieval_p_value_binomial_tail():
    colors = [(1.0, -1.0, -1.0), (-1.0, 1.0, -1.0), (-1.0, -1.0, 1.0),
              (0.9, 0.9, -1.0)]
    real = [_sprite(c) for c in colors]
    # perfect retrieval at n=4: P(X>=4), X~Bin(4, 1/4) = (1/4)^4
    rep = conditioning_report(real, real)
    assert rep["retrieval_p_value"] == pytest.approx(0.25**4)
    # unconditioned ties resolve to argmax index 0 -> 1 hit out of 3;
    # P(X>=1), X~Bin(3, 1/3) = 1 - (2/3)^3
    same = _sprite((0.2, 0.2, 0.2))
    rep = conditioning_report([same] * 3, real[:3])
    assert rep["retrieval_p_value"] <= 1.0
    assert rep["retrieval_p_value"] >= rep["chance_retrieval"] * 0  # defined
    # zero hits -> tail includes k=0 term upward: p-value == 1
    gen = [real[1], real[2], real[0]]  # every argmax is wrong
    rep = conditioning_report(gen, real[:3])
    assert rep["retrieval_at_1"] == 0.0
    assert rep["retrieval_p_value"] == pytest.approx(1.0)


def test_pairwise_shape():
    real = [_sprite((0.0, 0.0, 0.0))] * 3
    gen = [_sprite((0.5, 0.5, 0.5))] * 2
    s = pairwise_conditioning_scores(gen, real)
    assert s.shape == (2, 3)
    assert np.all((s >= 0.0) & (s <= 1.0))


def test_conditioning_report_on_tiny_generator():
    """Integration: generate_batch output plugs straight into
    conditioning_report (shapes/ranges compatible end to end)."""
    from tests.test_serve import _tiny_cfg
    from psg_tpu.serve.generator import PokemonGenerator

    gen = PokemonGenerator(_tiny_cfg())
    caps = ["red creature", "blue creature"]
    imgs = gen.generate_batch(caps, num_inference_steps=2, seed=0)
    real = [np.asarray(imgs[1]), np.asarray(imgs[0])]
    rep = conditioning_report([np.asarray(i) for i in imgs], real)
    assert rep["n"] == 2
    assert 0.0 <= rep["retrieval_at_1"] <= 1.0


def test_paraphrase_prompt_set_consistency():
    """The paraphrase eval set (scripts/eval_conditioning.py) must stay a
    name-free partition-consistent set: FAMILIES partitions the indices,
    and no paraphrase leaks its species name (that would reduce the
    wording-generalization test back to name-token retrieval)."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "eval_conditioning",
        Path(__file__).resolve().parent.parent / "scripts"
        / "eval_conditioning.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    n = len(mod.PARAPHRASES)
    covered = sorted(i for fam in mod.FAMILIES for i in fam)
    assert covered == list(range(n))
    assert sum(len(f) for f in mod.FAMILIES) == n  # disjoint

    from psg_tpu.data.dataset import read_description_csv

    rows = read_description_csv(
        "/root/reference/data/text_description_concat.csv")
    names = [r["english_name"] for r in rows[:n]]
    for cap, name in zip(mod.PARAPHRASES, names):
        assert name.lower() not in cap.lower(), (name, cap)


def test_pooled_binomial_across_seeds():
    """scripts/eval_table.py --pool: exact binomial tail over summed
    hits/trials; a single report pools to its own retrieval_p_value, and
    two identical 3/16 seed reports at chance 1/16 clear p<0.05 where one
    does not (the VERDICT r4 replication criterion)."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "eval_table",
        Path(__file__).resolve().parent.parent / "scripts" / "eval_table.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    one = {"n": 16, "chance_retrieval": 1 / 16, "retrieval_at_1": 3 / 16}
    single = mod.pooled_binomial([one])
    assert abs(single["pooled_p_value"] - 0.07420726082533873) < 1e-12
    assert single["hits"] == 3

    pooled = mod.pooled_binomial([one, dict(one)])
    assert pooled["n"] == 32 and pooled["hits"] == 6
    assert pooled["pooled_p_value"] < 0.05 < single["pooled_p_value"]

    import pytest

    with pytest.raises(ValueError):
        mod.pooled_binomial([one, {**one, "chance_retrieval": 1 / 8}])
