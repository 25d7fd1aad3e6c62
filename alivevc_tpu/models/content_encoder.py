"""ContentEncoder — ConvNeXt-1d stack distilled from WavLM.

Reference: module/content_encoder.py:8-25.  spec [N, T, 641] → content
[N, T, 768].  ~7.04 M params.  1x1 convs are matmuls (MXU); the only
non-pointwise op is the k=7 depthwise conv in each ConvNeXt block.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from alivevc_tpu.config import ContentEncoderConfig
from alivevc_tpu.nn.layers import (
    Params,
    convnext1d,
    init_convnext1d,
    init_linear,
    linear,
)


def init_content_encoder(key, cfg: ContentEncoderConfig = ContentEncoderConfig()) -> Params:
    keys = jax.random.split(key, cfg.num_layers + 2)
    return {
        "input_layer": init_linear(keys[0], cfg.input_channels, cfg.internal_channels),
        "mid_layers": [
            init_convnext1d(
                keys[1 + i],
                cfg.internal_channels,
                cfg.hidden_channels,
                cfg.kernel_size,
                scale=1.0 / cfg.num_layers,
            )
            for i in range(cfg.num_layers)
        ],
        "output_layer": init_linear(keys[-1], cfg.internal_channels, cfg.output_channels),
    }


def content_encoder(params: Params, spec: jax.Array) -> jax.Array:
    """spec [N, T, n_bins] → content [N, T, 768]."""
    x = linear(params["input_layer"], spec)
    for block in params["mid_layers"]:
        x = convnext1d(block, x)
    return linear(params["output_layer"], x)
