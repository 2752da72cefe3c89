"""TPU kernel layer.

Hot ops have two implementations:

- a pure-XLA reference (``psg_tpu.ops.xla_ref``) used on CPU and as the
  correctness oracle in tests,
- a Pallas TPU kernel (``psg_tpu.ops.flash_attention``,
  ``psg_tpu.ops.fused_norm``) used on TPU.

``sdpa`` dispatches by backend; call sites never branch themselves.
"""

from __future__ import annotations

import os

import jax

from psg_tpu.ops.xla_ref import sdpa_xla

_FORCE = os.environ.get("PSG_TPU_ATTN", "").lower()  # '', 'xla', 'pallas'


def _use_pallas() -> bool:
    """Default: XLA. Measured on v5e (bf16 UNet denoise chain, batch 2/4):
    XLA attention beats the Pallas kernel in-chain (343.8 vs 293.8 steps/s
    at b2; 238.8 vs 225.9 at b4) — XLA's fusion with surrounding ops
    outweighs the kernel's HBM savings at these shapes.  The kernel wins
    isolated mid-size self-attention (196 queries: 0.77ms vs 1.21ms) and
    stays available via PSG_TPU_ATTN=pallas; revisit when attention shapes
    grow."""
    if _FORCE == "pallas":
        return jax.default_backend() == "tpu"
    return False


_FORCE_GN = os.environ.get("PSG_TPU_FUSED_GN", "").lower()  # '', 'on', 'off'

# Empirical v5e dispatch threshold: the fused kernel wins when the
# per-sample fp32 block is small enough to pipeline well
# (measured: 0.93MB blocks 1.03ms vs 1.24ms XLA; 0.98MB 0.82 vs 2.07;
# but 1.87MB blocks lose 2.14 vs 1.89) — see /tmp-benchmarks in r1 notes.
_FUSED_GN_MAX_BYTES = int(1.25 * 1024 * 1024)


def group_norm_silu(params, x, num_groups: int, *, eps: float = 1e-5):
    """silu(group_norm(x)) with the fused Pallas kernel where it wins."""
    use = _FORCE_GN != "off" and jax.default_backend() == "tpu"
    if use and _FORCE_GN != "on":
        import numpy as _np

        per_sample = int(_np.prod(x.shape[1:])) * 4
        use = per_sample <= _FUSED_GN_MAX_BYTES
    if use:
        try:
            from psg_tpu.ops.fused_norm import fused_group_norm_silu

            return fused_group_norm_silu(params, x, num_groups, eps=eps)
        except Exception:  # pragma: no cover - fallback safety
            pass
    import jax.nn as _nn

    from psg_tpu.nn.layers import group_norm as _gn

    return _nn.silu(_gn(params, x, num_groups, eps=eps))


def sdpa(q, k, v, *, bias=None, scale=None):
    """Scaled dot-product attention.

    q: [B, H, Lq, D], k/v: [B, H, Lk, D], bias: broadcastable to
    [B, H, Lq, Lk] (additive, e.g. -inf padding mask). Returns [B, H, Lq, D].
    """
    if _use_pallas():
        try:
            from psg_tpu.ops.flash_attention import flash_sdpa

            return flash_sdpa(q, k, v, bias=bias, scale=scale)
        except Exception:  # pragma: no cover - fallback safety
            return sdpa_xla(q, k, v, bias=bias, scale=scale)
    return sdpa_xla(q, k, v, bias=bias, scale=scale)
