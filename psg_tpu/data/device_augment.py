"""On-device (jit-compatible) train-time augmentation.

TPU-native replacement for the host augmentation pipeline
(psg_tpu/data/augment.py; reference: torchvision transforms,
dataset_improved.py:150-158): RandomHorizontalFlip(0.5),
RandomRotation(±10°), ColorJitter(brightness/contrast/saturation 0.1,
hue 0.05), RandomResizedCrop(scale 0.9-1.0, ratio 0.9-1.1).

Motivation: this box reaches the TPU through a tunnel; shipping a fresh
augmented batch from the host every step costs ~100x the step's compute.
The device-resident fast path keeps the 898 uint8 sprites in HBM and
augments inside the jitted multi-step scan, so training never touches the
host (see train/fastpath.py).

Differences from the host path (documented, cosmetic at these magnitudes):
- rotation + resized-crop are fused into ONE inverse affine warp with a
  single bilinear resample (the host path resamples twice);
- hue jitter is an RGB-space hue rotation (YIQ approximation) instead of
  PIL's uint8 HSV channel shift;
- contrast centers on the per-image gray mean like PIL, computed in float.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Rec.601 luma, what PIL uses for L-mode conversions.  Kept as a numpy
# constant on purpose: a module-level jnp.array becomes a TRACER when the
# module is first imported inside a jit trace (stage 3's lazy import did
# exactly that and crashed the joint phase with an UnexpectedTracerError
# at the re-trace); numpy constants are trace-safe.
_LUMA = np.array([0.299, 0.587, 0.114], np.float32)


def _affine_coords(size: int, angle, scale_hw, center_shift):
    """Output-pixel grid -> input coords for rotate(angle) then
    crop(scale)+resize, both about the image center.

    angle: radians (counter-clockwise, matching PIL.rotate's positive
    direction); scale_hw: (2,) crop extent as a fraction of the full
    image per axis; center_shift: (2,) crop-center offset in pixels.
    """
    c = (size - 1) / 2.0
    ys, xs = jnp.meshgrid(jnp.arange(size, dtype=jnp.float32),
                          jnp.arange(size, dtype=jnp.float32), indexing="ij")
    # crop space: output pixel -> position inside the rotated image
    y = (ys - c) * scale_hw[0] + center_shift[0]
    x = (xs - c) * scale_hw[1] + center_shift[1]
    # rotate space: inverse rotation about the center
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    yi = ca * y - sa * x + c
    xi = sa * y + ca * x + c
    return yi, xi


def _bilinear_sample(img, yi, xi, fill):
    """img [H,W,3] float; out-of-bounds pixels take ``fill`` [3]."""
    h, w = img.shape[0], img.shape[1]
    inb = (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
    yc = jnp.clip(yi, 0.0, h - 1)
    xc = jnp.clip(xi, 0.0, w - 1)
    y0 = jnp.floor(yc).astype(jnp.int32)
    x0 = jnp.floor(xc).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (yc - y0)[..., None]
    wx = (xc - x0)[..., None]
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    out = (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx
           + v10 * wy * (1 - wx) + v11 * wy * wx)
    return jnp.where(inb[..., None], out, fill)


def _hue_rotation(x, radians):
    """Rotate hue by ``radians`` in YIQ space (luma-preserving)."""
    cu, su = jnp.cos(radians), jnp.sin(radians)
    # RGB -> YIQ -> rotate IQ -> RGB, folded into one 3x3 matrix
    to_yiq = jnp.array([[0.299, 0.587, 0.114],
                        [0.596, -0.274, -0.322],
                        [0.211, -0.523, 0.312]], jnp.float32)
    rot = jnp.array([[1.0, 0.0, 0.0],
                     [0.0, cu, -su],
                     [0.0, su, cu]], jnp.float32)
    from_yiq = jnp.array([[1.0, 0.956, 0.621],
                          [1.0, -0.272, -0.647],
                          [1.0, -1.106, 1.703]], jnp.float32)
    m = from_yiq @ rot @ to_yiq
    return jnp.einsum("...c,dc->...d", x, m)


def _augment_one(img01, key, background01,
                 degrees: float, scale: Tuple[float, float],
                 ratio: Tuple[float, float], jitter: Tuple[float, ...]):
    """img01 [H,W,3] in [0,1] -> augmented [H,W,3] in [0,1]."""
    size = img01.shape[0]
    kf, kr, ks, kar, kcy, kcx, kb, kc, ksat, kh = jax.random.split(key, 10)

    # RandomHorizontalFlip(0.5)
    img01 = jnp.where(jax.random.bernoulli(kf), img01[:, ::-1], img01)

    # rotation angle (degrees -> radians)
    ang = jax.random.uniform(kr, (), minval=-degrees, maxval=degrees)
    ang = ang * jnp.pi / 180.0

    # RandomResizedCrop params (scale of AREA, log-uniform aspect)
    area = jax.random.uniform(ks, (), minval=scale[0], maxval=scale[1])
    log_ar = jax.random.uniform(kar, (), minval=jnp.log(ratio[0]),
                                maxval=jnp.log(ratio[1]))
    aspect = jnp.exp(log_ar)
    cw = jnp.sqrt(area * aspect)   # fraction of width
    ch = jnp.sqrt(area / aspect)   # fraction of height
    # torch clamps the crop inside the image; at scale<=1, ratio~1 the
    # fractions stay <=1 after this clip
    cw = jnp.minimum(cw, 1.0)
    ch = jnp.minimum(ch, 1.0)
    # crop-center offset, uniform over valid positions
    max_dy = (1.0 - ch) * (size - 1) / 2.0
    max_dx = (1.0 - cw) * (size - 1) / 2.0
    dy = jax.random.uniform(kcy, (), minval=-1.0, maxval=1.0) * max_dy
    dx = jax.random.uniform(kcx, (), minval=-1.0, maxval=1.0) * max_dx

    yi, xi = _affine_coords(size, ang, jnp.stack([ch, cw]),
                            jnp.stack([dy, dx]))
    img01 = _bilinear_sample(img01, yi, xi, background01)

    # ColorJitter (PIL enhance semantics), then clip
    b, c, s, h = jitter
    img01 = img01 * (1.0 + jax.random.uniform(kb, (), minval=-b, maxval=b))
    gray_mean = jnp.mean(img01 @ _LUMA)
    cf = 1.0 + jax.random.uniform(kc, (), minval=-c, maxval=c)
    img01 = (img01 - gray_mean) * cf + gray_mean
    gray = (img01 @ _LUMA)[..., None]
    sf = 1.0 + jax.random.uniform(ksat, (), minval=-s, maxval=s)
    img01 = (img01 - gray) * sf + gray
    hue = jax.random.uniform(kh, (), minval=-h, maxval=h) * 2.0 * jnp.pi
    img01 = _hue_rotation(img01, hue)
    return jnp.clip(img01, 0.0, 1.0)


def augment_batch(images_u8, key, background_u8=(255, 255, 255), *,
                  degrees: float = 10.0,
                  scale: Tuple[float, float] = (0.9, 1.0),
                  ratio: Tuple[float, float] = (0.9, 1.1),
                  jitter: Tuple[float, ...] = (0.1, 0.1, 0.1, 0.05)):
    """uint8 [B,H,W,3] -> float32 [B,H,W,3] in [-1,1], augmented.

    jit-compatible; one PRNG key per call (split per sample inside).
    """
    b = images_u8.shape[0]
    imgs = images_u8.astype(jnp.float32) / 255.0
    bg = jnp.asarray(background_u8, jnp.float32) / 255.0
    keys = jax.random.split(key, b)
    out = jax.vmap(
        lambda im, k: _augment_one(im, k, bg, degrees, scale, ratio, jitter)
    )(imgs, keys)
    return out * 2.0 - 1.0


def normalize_batch(images_u8):
    """uint8 [B,H,W,3] -> float32 [-1,1] (eval path, no augmentation)."""
    return images_u8.astype(jnp.float32) / 127.5 - 1.0
