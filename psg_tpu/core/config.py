"""Typed configuration for the whole framework.

The reference loads a raw YAML dict with no validation and reaches into it
with nested ``.get`` calls everywhere (reference: src/training/vae_trainer.py:629-633,
config/train_config.yaml:1-67).  Here the same YAML section names map onto
typed dataclasses, with a loader that tolerates unknown keys (warns) and
supports ``section.key=value`` CLI overrides.
"""

from __future__ import annotations

import dataclasses
import logging
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Optional, Tuple, Union

import yaml

log = logging.getLogger(__name__)


@dataclass
class ModelConfig:
    # Text encoder (reference: src/models/text_encoder.py:12-34)
    bert_model: str = "google-bert/bert-base-uncased"
    text_embedding_dim: int = 768
    bert_finetune_strategy: str = "minimal"  # none | minimal | partial | full
    max_text_len: int = 256  # tokenizer truncation (reference: text_encoder.py:148)

    # VAE / latent space (reference: src/models/vae_decoder.py:68-174)
    latent_dim: int = 8
    image_size: int = 215
    latent_size: int = 27
    # 1.0 = reference channel widths (32..512); <1 builds a proportionally
    # narrower tower (tests / CPU dryruns)
    vae_width_scale: float = 1.0

    # Diffusion (reference: config/train_config.yaml:18-21)
    num_timesteps: int = 1000
    beta_start: float = 1e-4
    beta_end: float = 0.02
    beta_schedule: str = "cosine"  # cosine (stage-2 default) | linear

    # Custom UNet (reference: src/models/unet.py:304-326)
    time_emb_dim: int = 128
    num_attention_heads: int = 4  # trainer default (improved_diffusion_trainer.py:211-216)
    unet_channels: Tuple[int, ...] = (320, 640, 1280, 1280)

    # Behavioral-compat knobs for the reference's attention damping
    # (reference: src/models/unet.py:220,238,250).  Set all to 1.0 for the
    # structurally-stable default-free path.
    self_attn_scale: float = 0.7
    cross_attn_scale: float = 0.8
    ffn_scale: float = 0.6
    attn_dropout: float = 0.05

    # Latent clamp used in stage 2 (improved_diffusion_trainer.py:363)
    latent_clamp: float = 3.0

    # Compute dtype for matmul-heavy paths ("bfloat16" on TPU, "float32" for
    # parity tests). Params are always stored fp32.
    compute_dtype: str = "float32"

    # Legacy/compat fields accepted from reference YAML (unused by the
    # custom-UNet path but kept so reference configs load cleanly).
    pretrained_model_name: str = "runwayml/stable-diffusion-v1-5"
    cross_attention_dim: int = 768
    attention_head_dim: int = 8
    use_flash_attention: bool = True
    freeze_encoder: bool = True
    freeze_decoder: bool = True


@dataclass
class DataConfig:
    csv_path: str = "data/text_description_concat.csv"
    image_dir: str = "data/small_images"
    batch_size: int = 4
    image_size: int = 215
    num_workers: int = 4
    pin_memory: bool = True  # accepted for reference-config compat; no-op
    val_split: float = 0.15
    test_split: float = 0.05
    background_color: Union[str, Tuple[int, int, int]] = "white"
    seed: int = 42
    # Fixed tokenized text length fed to the jitted step (the reference
    # tokenizes dynamically inside forward, text_encoder.py:148; we
    # pre-tokenize to a static shape for XLA).
    text_len: int = 128
    augment: bool = True
    prefetch: int = 2


@dataclass
class TrainingConfig:
    vae_epochs: int = 50
    diffusion_epochs: int = 50
    final_epochs: int = 20

    # KL annealing (reference: vae_trainer.py:225-247)
    kl_anneal_start: int = 0
    kl_anneal_end: int = 3
    kl_weight_start: float = 0.0
    kl_weight_end: float = 0.01
    free_bits: float = 0.1

    # Loss weights (reference: config/train_config.yaml:47-50)
    reconstruction_weight: float = 1.0
    perceptual_weight: float = 0.01
    kl_weight: float = 0.001

    # Stage-3 (reference: final_trainer.py:425-473,590-642)
    clip_weight: float = 0.1
    phase1_epochs: Optional[int] = None  # default final_epochs // 2

    log_every: int = 5
    save_every: int = 20
    sample_every: int = 15
    # Device-resident fast path (train/fastpath.py): whole split in HBM,
    # on-device augmentation, one lax.scan per epoch.  Classic per-batch
    # loader path when False (required for mesh runs).
    fast_path: bool = False
    # Validate every N epochs (host calls are expensive through the
    # tunnel; the fast path batches each validation into one call)
    val_every: int = 1
    # Best-checkpoint writes compete only every N epochs (full-size states
    # are ~8GB; on a tunneled device each write costs minutes, so long runs
    # throttle them).  1 = reference behavior (every improvement writes).
    best_every: int = 1


@dataclass
class OptimizationConfig:
    optimizer: str = "adamw"
    learning_rate: float = 3e-4
    text_encoder_lr: float = 1e-4
    weight_decay: float = 0.01
    max_grad_norm: float = 1.0
    text_max_grad_norm: float = 0.5  # (reference: vae_trainer.py:341-342)
    # Reject (zero) updates whose RAW grad norm exceeds this — the
    # finite-magnitude sibling of the NaN skip; None disables. A clipped
    # explosion burst was measured to collapse the UNet (see
    # train/optim.py:skip_above_global_norm).
    skip_grad_norm: Optional[float] = None
    use_mixed_precision: bool = False
    scheduler: str = "constant"  # constant | cosine | step | warmup_cosine
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    # Stage-2 OneCycle warmup fraction (improved_diffusion_trainer.py:313-319)
    onecycle_pct_start: float = 0.1
    # 'warmup_cosine': linear warmup over this many steps, then cosine
    # decay to lr_end_factor * lr (the r3 stability plan for the 655M UNet:
    # the measured collapses happened at constant lr)
    warmup_steps: int = 500
    lr_end_factor: float = 0.1
    # EMA decay for sampling/eval params (0 disables; stage 2 uses the EMA
    # for sample grids + the best checkpoint's sampling params)
    ema_decay: float = 0.0
    # Adam first-moment storage dtype (None = param dtype).  'bfloat16'
    # halves mu's HBM (1.3 GB on the 655M UNet) — safe because momentum
    # increments are (1-beta1)=0.1-scale, well above bf16's ~4e-3 relative
    # resolution.  (The EMA must stay fp32: its 5e-4-scale increments
    # would vanish in bf16.)
    mu_dtype: Optional[str] = None


@dataclass
class MeshConfig:
    """Device-mesh layout.  ``data=-1`` means "all remaining devices"."""

    data: int = -1
    model: int = 1


@dataclass
class Config:
    experiment_dir: str = "experiments"
    device: str = "tpu"  # accepted for reference-config compat
    seed: int = 42
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    optimization: OptimizationConfig = field(default_factory=OptimizationConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    # Free-form escape hatch for sections we don't model (e.g. the
    # reference's optional `unet_optimization` override cascade,
    # improved_diffusion_trainer.py:256-268).
    extra: Dict[str, Any] = field(default_factory=dict)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


_SECTIONS = {
    "model": ModelConfig,
    "data": DataConfig,
    "training": TrainingConfig,
    "optimization": OptimizationConfig,
    "mesh": MeshConfig,
}


def _build_section(cls, raw: Dict[str, Any], section: str):
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in raw.items():
        if k in fields:
            if isinstance(v, list):
                v = tuple(v)
            kwargs[k] = v
        else:
            log.warning("config: unknown key %s.%s (ignored)", section, k)
    return cls(**kwargs)


def config_from_dict(raw: Dict[str, Any]) -> Config:
    cfg = Config()
    extra: Dict[str, Any] = {}
    for k, v in raw.items():
        if k in _SECTIONS and isinstance(v, dict):
            setattr(cfg, k, _build_section(_SECTIONS[k], v, k))
        elif k in ("experiment_dir", "device", "seed"):
            setattr(cfg, k, v)
        else:
            extra[k] = v
    cfg.extra = extra
    return cfg


def apply_device(cfg: "Config") -> None:
    """Honor ``device: cpu`` (YAML or ``--override device=cpu``).

    This box pins ``JAX_PLATFORMS`` to a TPU plugin, so the env var alone
    cannot force CPU; the config update must land before JAX initializes
    its backends.  No-op for any other device string (JAX picks the
    platform as usual).  Reference-config compat: the reference selects
    mps/cuda/cpu from its ``device`` key at startup (train_3stage.py).
    """
    if str(cfg.device).lower() == "cpu":
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError as e:  # backends already initialized
            log.warning("device=cpu requested but JAX already initialized "
                        "(%s) — platform unchanged", e)


def configure_jax(cfg: "Config") -> None:
    """Process-level JAX setup for the production entry points (training
    CLI, serving CLI, bench): honor ``device`` and enable the persistent
    XLA compilation cache so watchdog relaunches / repeat runs skip
    recompiling identical programs (the same cache that cut the test
    suite 38 min -> ~10 min on a 1-CPU host).  Cache dir override:
    ``PSG_TPU_XLA_CACHE`` (empty string disables)."""
    import os

    apply_device(cfg)
    cache = os.environ.get("PSG_TPU_XLA_CACHE",
                           os.path.expanduser("~/.cache/psg_tpu/xla"))
    if cache:
        import jax

        try:
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception as e:  # pragma: no cover - depends on jax version
            log.warning("compilation cache unavailable: %s", e)


def _parse_value(s: str) -> Any:
    try:
        v = yaml.safe_load(s)
    except yaml.YAMLError:
        return s
    if isinstance(v, str):
        # YAML 1.1 reads exponent-form floats without a dot ("1e-5") as
        # strings; numeric CLI overrides must stay numeric
        try:
            return float(v)
        except ValueError:
            return v
    return v


def apply_overrides(cfg: Config, overrides) -> Config:
    """Apply ``section.key=value`` dotted overrides in place."""
    for item in overrides or []:
        if "=" not in item:
            raise ValueError(f"override must be key=value, got {item!r}")
        path, value = item.split("=", 1)
        parts = path.split(".")
        obj: Any = cfg
        for p in parts[:-1]:
            # ``extra`` (and its nested keys) are open-ended dicts
            if isinstance(obj, dict):
                obj = obj.setdefault(p, {})
            else:
                obj = getattr(obj, p)
        leaf = parts[-1]
        parsed = _parse_value(value)
        if isinstance(parsed, list):
            parsed = tuple(parsed)
        if isinstance(obj, dict):
            obj[leaf] = parsed
        else:
            if not hasattr(obj, leaf):
                raise ValueError(f"unknown config key {path!r}")
            setattr(obj, leaf, parsed)
    return cfg


def load_config(path: Union[str, Path, None] = None, overrides=None) -> Config:
    """Load YAML config (same section names as the reference) + overrides."""
    if path is None:
        cfg = Config()
    else:
        with open(path, "r") as f:
            raw = yaml.safe_load(f) or {}
        cfg = config_from_dict(raw)
    return apply_overrides(cfg, overrides)
