"""Optimizer construction (optax).

Covers the reference's optimization surface:

- AdamW/Adam with per-component param groups and learning rates
  (vae_trainer.py:156-190: vae lr, text lr = text_encoder_lr or 0.1x);
- per-component gradient clipping (vae 1.0 / text 0.5, vae_trainer.py:341-342);
- epoch-level schedulers constant / cosine / step (vae_trainer.py:191-209)
  and the stage-2 OneCycle per-step schedule with 10% warmup
  (improved_diffusion_trainer.py:302-319) via optax.cosine_onecycle_schedule;
- frozen components (finetune masks) as zero-update groups;
- NaN/Inf robustness via ``optax.apply_if_finite`` — non-finite grads leave
  params AND inner optimizer state untouched and bump a counter, the
  branchless equivalent of the reference's skip-batch machinery
  (improved_diffusion_trainer.py:376-393).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax


def make_lr_schedule(kind: str, base_lr: float, *, total_steps: int,
                     steps_per_epoch: int = 1, step_size_epochs: int = 30,
                     gamma: float = 0.1, pct_start: float = 0.1,
                     warmup_steps: int = 500, end_factor: float = 0.1):
    """-> optax schedule fn.

    'constant', 'cosine' (anneal to 0 over total_steps, the per-step
    equivalent of CosineAnnealingLR(T_max=epochs)), 'step'
    (StepLR(step_size, gamma)), 'onecycle' (OneCycleLR, pct_start warmup),
    'warmup_cosine' (linear warmup then cosine decay to end_factor*lr —
    the r3 stage-2 stability schedule).
    """
    if kind == "constant":
        return optax.constant_schedule(base_lr)
    if kind == "warmup_cosine":
        warmup = min(max(warmup_steps, 1), max(total_steps - 1, 1))
        return optax.warmup_cosine_decay_schedule(
            init_value=base_lr * 1e-2, peak_value=base_lr,
            warmup_steps=warmup, decay_steps=max(total_steps, 2),
            end_value=base_lr * end_factor)
    if kind == "cosine":
        return optax.cosine_decay_schedule(base_lr, decay_steps=max(total_steps, 1))
    if kind == "step":
        boundaries = {}
        e = step_size_epochs
        scale = 1.0
        while e * steps_per_epoch < total_steps:
            scale *= gamma
            boundaries[e * steps_per_epoch] = gamma
            e += step_size_epochs
        return optax.piecewise_constant_schedule(base_lr, boundaries)
    if kind == "onecycle":
        return optax.cosine_onecycle_schedule(
            transition_steps=max(total_steps, 1), peak_value=base_lr,
            pct_start=pct_start,
        )
    raise ValueError(f"unknown scheduler {kind!r}")


def skip_above_global_norm(threshold: float,
                           inner: optax.GradientTransformation):
    """Skip the whole update when the RAW gradient norm exceeds
    ``threshold`` (counted in ``skipped``), leaving the INNER optimizer
    state (Adam moments, bias-correction counts) untouched — the
    finite-magnitude sibling of ``optax.apply_if_finite``.

    Clipping alone does not survive a gradient explosion: a burst of
    ~45 norm-clipped steps was measured to collapse the 655M UNet from
    loss 0.59 back to the zero-prediction plateau (evidence run,
    epoch 324).  Wrapping (rather than zeroing updates in front of Adam)
    means a rejected burst can no longer decay mu/nu toward zero or
    advance bias correction (ADVICE r2)."""

    def init_fn(params):
        return {"skipped": jnp.zeros((), jnp.int32),
                "inner": inner.init(params)}

    def update_fn(updates, state, params=None):
        gn = optax.global_norm(updates)
        ok = gn <= threshold
        new_updates, new_inner = inner.update(updates, state["inner"], params)
        scale = jnp.where(ok, 1.0, 0.0)
        out = jax.tree_util.tree_map(lambda u: u * scale, new_updates)
        kept_inner = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old) if hasattr(new, "dtype")
            else new, new_inner, state["inner"])
        return out, {"skipped": state["skipped"] + jnp.int32(~ok),
                     "inner": kept_inner}

    return optax.GradientTransformation(init_fn, update_fn)


def _group_tx(opt_cfg, lr_schedule, max_grad_norm: Optional[float]):
    chain = []
    if max_grad_norm is not None and max_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    # mu in bf16 halves first-moment HBM; increments are (1-b1)-scale so
    # bf16 resolution is ample (config.OptimizationConfig.mu_dtype)
    mu_dtype = getattr(opt_cfg, "mu_dtype", None)
    if opt_cfg.optimizer == "adamw":
        chain.append(optax.adamw(lr_schedule, b1=opt_cfg.beta1, b2=opt_cfg.beta2,
                                 eps=opt_cfg.eps, weight_decay=opt_cfg.weight_decay,
                                 mu_dtype=mu_dtype))
    elif opt_cfg.optimizer == "adam":
        chain.append(optax.adam(lr_schedule, b1=opt_cfg.beta1, b2=opt_cfg.beta2,
                                eps=opt_cfg.eps, mu_dtype=mu_dtype))
    else:
        raise ValueError(f"unknown optimizer {opt_cfg.optimizer!r}")
    tx = optax.chain(*chain)
    skip_norm = getattr(opt_cfg, "skip_grad_norm", None)
    if skip_norm is not None and skip_norm > 0:
        # wraps the whole chain: the raw norm gates, skipped steps freeze
        # Adam state
        tx = skip_above_global_norm(skip_norm, tx)
    return tx


def build_optimizer(opt_cfg, groups: Dict[str, dict], label_tree,
                    *, max_consecutive_errors: int = 1000):
    """Multi-group optimizer.

    groups: name -> {'lr_schedule': fn, 'max_grad_norm': float|None}
            plus the implicit 'frozen' group (zero updates).
    label_tree: pytree (matching params) of group-name strings.
    """
    transforms = {
        name: _group_tx(opt_cfg, g["lr_schedule"], g.get("max_grad_norm"))
        for name, g in groups.items()
    }
    transforms["frozen"] = optax.set_to_zero()
    tx = optax.multi_transform(transforms, label_tree)
    return optax.apply_if_finite(tx, max_consecutive_errors=max_consecutive_errors)


def labels_from_mask(mask_tree, trainable_label: str):
    """Boolean finetune-mask pytree -> label pytree (frozen/<label>)."""
    return jax.tree_util.tree_map(
        lambda t: trainable_label if t else "frozen", mask_tree
    )


def notfinite_count(opt_state):
    """Skipped-batch counter from the apply_if_finite wrapper state."""
    return opt_state.total_notfinite
