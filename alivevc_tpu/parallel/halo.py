"""Time-axis sharding with halo exchange — this workload's sequence parallelism.

There is no attention anywhere in the model family (SURVEY §2.2): every
frame-level model is a stack of finite-receptive-field convolutions
interleaved with pointwise ops, so a long utterance can be sharded along time
with each device exchanging only a (k-1)/2-frame *halo* with its ring
neighbours via ``ppermute`` over ICI **at each depthwise conv**.  Exchanging
per layer (rather than one big input halo) makes the sharded computation
bit-identical to the dense one everywhere, including the global edges: the
halo a device receives is its neighbour's *real* previous-layer output, and
the global edges receive zeros — exactly the dense conv's zero padding.

Cost: num_layers ppermutes of [halo, C] frames (4 × [3, 512] for the content
encoder) — negligible against the 1536-wide pointwise matmuls they unlock.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from alivevc_tpu.nn.layers import (
    Params,
    adaptive_channel_norm,
    channel_norm,
    conv1d,
    gelu,
    linear,
)


def halo_pad(x: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """Pad a [T_local, C] slice with neighbours' edge frames (zeros at the
    global edges, matching dense zero-padded convolution)."""
    n = jax.lax.axis_size(axis_name)
    i = jax.lax.axis_index(axis_name)
    left = jax.lax.ppermute(x[-halo:], axis_name, [(j, (j + 1) % n) for j in range(n)])
    right = jax.lax.ppermute(x[:halo], axis_name, [(j, (j - 1) % n) for j in range(n)])
    zeros = jnp.zeros_like(x[:halo])
    left = jnp.where(i == 0, zeros, left)
    right = jnp.where(i == n - 1, zeros, right)
    return jnp.concatenate([left, x, right], axis=0)


def _dw_conv_halo(p: Params, x: jax.Array, axis_name: str) -> jax.Array:
    """Depthwise conv with same-padding realised through halo exchange.
    x: [T_local, C] → [T_local, C]."""
    k = p["w"].shape[0]
    halo = (k - 1) // 2
    padded = halo_pad(x, halo, axis_name)
    c = x.shape[-1]
    return conv1d(padded[None], p["w"][:, None, :], p["b"], groups=c)[0]


def convnext1d_sharded(p: Params, x: jax.Array, axis_name: str) -> jax.Array:
    """ConvNeXt1d block on a time-sharded [T_local, C] slice."""
    h = _dw_conv_halo(p["dw_conv"], x, axis_name)
    h = channel_norm(p["norm"], h)
    h = linear(p["pw_conv1"], h)
    h = gelu(h)
    h = linear(p["pw_conv2"], h)
    return h * p["scale"] + x


def adaptive_convnext1d_sharded(
    p: Params, x: jax.Array, cond: jax.Array, axis_name: str
) -> jax.Array:
    h = _dw_conv_halo(p["dw_conv"], x, axis_name)
    h = adaptive_channel_norm(p["norm"], h, cond)
    h = linear(p["pw_conv1"], h)
    h = gelu(h)
    h = linear(p["pw_conv2"], h)
    return h * p["scale"] + x


def content_encoder_sharded(params: Params, spec: jax.Array, axis_name: str) -> jax.Array:
    """ContentEncoder on a time-sharded [T_local, 641] slice (call inside
    shard_map / pjit with ``spec`` sharded along time)."""
    x = linear(params["input_layer"], spec)
    for block in params["mid_layers"]:
        x = convnext1d_sharded(block, x, axis_name)
    return linear(params["output_layer"], x)


def f0_estimator_sharded(params: Params, spec: jax.Array, axis_name: str) -> jax.Array:
    x = linear(params["input_layer"], spec)
    for block in params["mid_layers"]:
        x = convnext1d_sharded(block, x, axis_name)
    x = channel_norm(params["last_norm"], x)
    return linear(params["output_layer"], x)


def feature_extractor_sharded(
    params: Params, content: jax.Array, f0: jax.Array, axis_name: str
) -> jax.Array:
    """Decoder FeatureExtractor (module/decoder.py:27-48) on time-sharded
    [T_local, ...] slices — completes halo SP over every frame-rate ConvNeXt
    stack in the model family (VERDICT r3 item 9).  The F0Encoder condition
    is pointwise (1x1 convs + sin), so only the depthwise convs inside the
    AdaptiveConvNeXt blocks exchange halos.

    The sample-rate Filter U-Net is deliberately NOT time-sharded: the
    long-audio axis for synthesis is window-level data parallelism (the
    reference's own overlap-discard chunking, infer/offline.py), which is
    embarrassingly parallel at 3 s granularity.  See PARITY.md."""
    from alivevc_tpu.models.decoder import f0_encoder

    x = linear(params["input_layer"], content)
    # fp32 island for the sinusoidal F0 encode (models/decoder.py:96)
    cond = f0_encoder(params["f0_enc"], f0.astype(jnp.float32)).astype(x.dtype)
    for block in params["mid_layers"]:
        x = adaptive_convnext1d_sharded(block, x, cond, axis_name)
    return x


def sharded_frame_model(
    mesh: Mesh,
    model_fn: Callable[[jax.Array, str], jax.Array],
    x: jax.Array,            # [T, C_in], T divisible by the axis size
    axis_name: str = "data",
) -> jax.Array:
    """Run a ``*_sharded`` model over a time-sharded input.  Output is
    time-sharded the same way and equals the dense model exactly."""

    fn = jax.shard_map(
        lambda xs: model_fn(xs, axis_name),
        mesh=mesh,
        in_specs=P(axis_name),
        out_specs=P(axis_name),
        check_vma=False,
    )
    return fn(x)
