"""VGG16 feature extractor for perceptual loss.

Covers torchvision ``vgg16().features`` as used by the reference
(src/models/losses.py:33-34): only the prefix up to ReLU index 15 is needed
for taps [8, 15].  Weight conversion from a torchvision state_dict is in
``psg_tpu.models.convert``; with no pretrained weights available (offline),
a fixed-seed random init is used — random VGG features still define a
meaningful perceptual metric and keep the loss plumbing identical.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from psg_tpu.nn.layers import conv2d, conv2d_init

# (torchvision features index, cin, cout); pools occur at indices 4 and 9
_CONVS = (
    (0, 3, 64),
    (2, 64, 64),
    (5, 64, 128),
    (7, 128, 128),
    (10, 128, 256),
    (12, 256, 256),
    (14, 256, 256),
)
_POOL_AFTER = {3, 8}  # ReLU indices 3 and 8 are followed by MaxPool (4, 9)

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def vgg16_init(key, dtype=jnp.float32):
    ks = jax.random.split(key, len(_CONVS))
    return {
        f"conv{idx}": conv2d_init(k, cin, cout, 3, init="torch", dtype=dtype)
        for k, (idx, cin, cout) in zip(ks, _CONVS)
    }


def _maxpool2(x):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def vgg16_features(params, x, taps: Sequence[int] = (8, 15), *,
                   dtype=None) -> List[jnp.ndarray]:
    """x: [B,H,W,3] in [0,1] -> feature maps at torchvision layer indices.

    Applies ImageNet normalization internally (losses.py:51-53).
    """
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    x = (x - mean) / std

    feats = []
    layer_idx = 0
    for conv_idx, _cin, _cout in _CONVS:
        x = conv2d(params[f"conv{conv_idx}"], x, stride=1, padding=1, dtype=dtype)
        x = jax.nn.relu(x)
        relu_idx = conv_idx + 1
        if relu_idx in taps:
            feats.append(x)
        if relu_idx in _POOL_AFTER:
            x = _maxpool2(x)
        layer_idx = relu_idx
        if layer_idx >= max(taps):
            break
    return feats
