"""F0Estimator — 4096-way per-frame pitch classifier; bin index == Hz.

Reference: module/f0_estimator.py:8-43.  spec [N, T, 641] → logits
[N, T, 4096]; ``f0_estimate`` = argmax → float Hz [N, T, 1] (1 Hz resolution,
labels are floor(f0_hz), SURVEY §2.4.4).  ~2.28 M params.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from alivevc_tpu.config import F0EstimatorConfig
from alivevc_tpu.nn.layers import (
    Params,
    channel_norm,
    convnext1d,
    init_channel_norm,
    init_convnext1d,
    init_linear,
    linear,
)


def init_f0_estimator(key, cfg: F0EstimatorConfig = F0EstimatorConfig()) -> Params:
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
        "last_norm": init_channel_norm(cfg.internal_channels),
        "output_layer": init_linear(keys[-1], cfg.internal_channels, cfg.output_channels),
    }


def f0_estimator(params: Params, spec: jax.Array) -> jax.Array:
    """spec [N, T, n_bins] → logits [N, T, 4096]."""
    x = linear(params["input_layer"], spec)
    for block in params["mid_layers"]:
        x = convnext1d(block, x)
    x = channel_norm(params["last_norm"], x)
    return linear(params["output_layer"], x)


def f0_estimate(params: Params, spec: jax.Array) -> jax.Array:
    """spec [N, T, n_bins] → f0 in Hz [N, T, 1] (argmax over bins, no grad)."""
    logits = f0_estimator(params, spec)
    f0 = jnp.argmax(logits, axis=-1).astype(spec.dtype)
    return jax.lax.stop_gradient(f0)[..., None]
