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
    if _FORCE == "xla":
        return False
    if _FORCE == "pallas":
        return True
    return jax.default_backend() == "tpu"


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
