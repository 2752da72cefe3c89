"""Config loading + ``section.key=value`` override semantics.

Covers the reference's YAML config surface (config/train_config.yaml)
plus the typed-config CLI override extension, including the open-ended
``extra`` dict used for experiment knobs (extra.cond_dropout etc.).
"""

import pytest

from psg_tpu.core.config import Config, apply_overrides


def test_override_typed_section():
    cfg = apply_overrides(Config(), ["training.vae_epochs=3",
                                     "optimization.learning_rate=2e-4"])
    assert cfg.training.vae_epochs == 3
    # YAML 1.1 parses dotless exponent floats as strings; overrides must
    # stay numeric
    assert cfg.optimization.learning_rate == pytest.approx(2e-4)
    assert isinstance(cfg.optimization.learning_rate, float)


def test_override_unknown_typed_key_raises():
    with pytest.raises(ValueError, match="unknown config key"):
        apply_overrides(Config(), ["training.bogus_key=1"])


def test_override_extra_dict_keys():
    """extra.* overrides land in the open-ended dict (regression: these
    raised 'unknown config key' because dicts have no attributes)."""
    cfg = apply_overrides(Config(), ["extra.cond_dropout=0.1",
                                     "extra.snr_gamma=5.0",
                                     "extra.sample_sampler=dpmpp"])
    assert cfg.extra["cond_dropout"] == pytest.approx(0.1)
    assert cfg.extra["snr_gamma"] == pytest.approx(5.0)
    assert cfg.extra["sample_sampler"] == "dpmpp"


def test_override_extra_nested_dict_created():
    cfg = apply_overrides(Config(), ["extra.optimization.unet_lr=1e-5"])
    assert cfg.extra["optimization"]["unet_lr"] == pytest.approx(1e-5)


def test_apply_device_cpu_forces_platform():
    """device=cpu must win even when the environment pins a TPU plugin
    platform (JAX_PLATFORMS env alone does not override the pin on such
    hosts — serving/training CLIs call apply_device before backend init)."""
    import subprocess
    import sys

    code = (
        "from psg_tpu.core.config import Config, apply_device\n"
        "c = Config(); c.device = 'cpu'\n"
        "apply_device(c)\n"
        "import jax\n"
        "assert jax.default_backend() == 'cpu', jax.default_backend()\n"
        "print('ok')\n"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=180, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ok" in r.stdout


def test_override_string_values_stay_strings():
    cfg = apply_overrides(Config(), [
        "model.bert_model=google-bert/bert-base-uncased"])
    assert cfg.model.bert_model == "google-bert/bert-base-uncased"
