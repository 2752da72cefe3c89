from psg_tpu.nn.init import (
    kaiming_normal,
    kaiming_uniform_torch,
    xavier_uniform,
    zeros,
)
from psg_tpu.nn.layers import (
    cast_matmul_weights,
    conv2d,
    conv2d_init,
    group_norm,
    group_norm_init,
    largest_group_count,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
)
from psg_tpu.nn.attention import (
    mha,
    mha_init,
    spatial_cross_attention,
    spatial_cross_attention_init,
)
from psg_tpu.nn.embeddings import sinusoidal_time_embedding
from psg_tpu.nn.resize import bilinear_resize

__all__ = [
    "kaiming_normal",
    "kaiming_uniform_torch",
    "xavier_uniform",
    "zeros",
    "conv2d",
    "conv2d_init",
    "group_norm",
    "group_norm_init",
    "largest_group_count",
    "layer_norm",
    "layer_norm_init",
    "linear",
    "linear_init",
    "mha",
    "mha_init",
    "spatial_cross_attention",
    "spatial_cross_attention_init",
    "sinusoidal_time_embedding",
    "bilinear_resize",
]
