"""NN building blocks as pure functions over parameter pytrees.

Channels-last layout throughout: activations are [N, T, C] so that pointwise
(1x1) convolutions are plain matmuls over the lane dimension (C = 512/768/1536
all map cleanly onto the 128-wide MXU/VPU lanes), and depthwise convolutions
keep C on the lanes with a short (k=7) time window.

Semantics mirror the reference blocks exactly (module/common.py:14-92):

  * ChannelNorm normalizes over channels with an *unbiased* std (torch
    ``x.std`` default) and adds eps to sigma, not to the variance.
  * ConvNeXt1d: depthwise k=7 → ChannelNorm → pw C→H → exact (erf) GELU →
    pw H→C → learnable per-channel residual scale → +residual.
  * AdaptiveConvNeXt1d conditions the norm's scale/shift on a FiLM tensor.
  * CausalConv1d left-pads with *reflection* padding (streaming-safe).

Parameter layouts (importer-friendly, TPU-friendly):
  * pointwise / linear: ``w`` [Cin, Cout], ``b`` [Cout]
  * depthwise conv:     ``w`` [k, C],      ``b`` [C]
  * general conv:       ``w`` [k, Cin, Cout], ``b`` [Cout]

Initializers reproduce torch Conv1d defaults (kaiming_uniform(a=sqrt(5)) →
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and bias) so that
training-from-scratch starts from the same distribution as the reference.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def gelu(x: jax.Array) -> jax.Array:
    """Exact erf-based GELU (torch F.gelu default)."""
    return jax.nn.gelu(x, approximate=False)


def linear(p: Params, x: jax.Array) -> jax.Array:
    """Pointwise conv / linear: x [..., Cin] @ w [Cin, Cout] + b."""
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def conv1d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    stride: int = 1,
    padding=0,
    dilation: int = 1,
    groups: int = 1,
) -> jax.Array:
    """1-D conv, channels-last.  x [N, T, Cin], w [k, Cin/groups, Cout]."""
    if isinstance(padding, int):
        padding = (padding, padding)
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[padding],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    if b is not None:
        y = y + b
    return y


def depthwise_conv1d(
    x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None, padding: int = 0,
    dilation: int = 1,
) -> jax.Array:
    """Depthwise conv: x [N, T, C], w [k, C].

    Written as k shifted elementwise multiply-adds rather than a grouped
    conv_general_dilated — per-channel groups lower to per-group MXU passes
    on TPU, while the shifted form is pure VPU work that XLA fuses with the
    surrounding elementwise ops.
    """
    k = w.shape[0]
    xp = jnp.pad(x, ((0, 0), (padding, padding), (0, 0))) if padding else x
    t_out = xp.shape[1] - (k - 1) * dilation
    y = None
    for j in range(k):
        seg = jax.lax.slice_in_dim(xp, j * dilation, j * dilation + t_out, axis=1)
        term = seg * w[j]
        y = term if y is None else y + term
    if b is not None:
        y = y + b
    return y


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    """Same-padding helper (module/common.py:10-11)."""
    return int((kernel_size * dilation - dilation) / 2)


# ---------------------------------------------------------------------------
# norms
# ---------------------------------------------------------------------------


def _norm_stats(x: jax.Array, eps: float):
    """Channel-axis mean and unbiased std (+eps on sigma), torch semantics."""
    c = x.shape[-1]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    d = x - mu
    var = jnp.sum(d * d, axis=-1, keepdims=True) / (c - 1)
    sigma = jnp.sqrt(var) + eps
    return d / sigma


def channel_norm(p: Params, x: jax.Array, eps: float = 1e-4) -> jax.Array:
    """ChannelNorm (module/common.py:14-26).  x [N, T, C]."""
    return _norm_stats(x, eps) * p["scale"] + p["shift"]


def adaptive_channel_norm(
    p: Params, x: jax.Array, cond: jax.Array, eps: float = 1e-4
) -> jax.Array:
    """AdaptiveChannelNorm (module/common.py:29-41): FiLM from ``cond``."""
    scale = linear(p["scale"], cond)
    shift = linear(p["shift"], cond)
    return _norm_stats(x, eps) * scale + shift


# ---------------------------------------------------------------------------
# ConvNeXt blocks
# ---------------------------------------------------------------------------


def convnext1d(p: Params, x: jax.Array) -> jax.Array:
    """ConvNeXt1d block (module/common.py:45-62).  x [N, T, C]."""
    k = p["dw_conv"]["w"].shape[0]
    h = depthwise_conv1d(x, p["dw_conv"]["w"], p["dw_conv"]["b"], padding=get_padding(k))
    h = channel_norm(p["norm"], h)
    h = linear(p["pw_conv1"], h)
    h = gelu(h)
    h = linear(p["pw_conv2"], h)
    return h * p["scale"] + x


def adaptive_convnext1d(p: Params, x: jax.Array, cond: jax.Array) -> jax.Array:
    """AdaptiveConvNeXt1d block (module/common.py:65-82)."""
    k = p["dw_conv"]["w"].shape[0]
    h = depthwise_conv1d(x, p["dw_conv"]["w"], p["dw_conv"]["b"], padding=get_padding(k))
    h = adaptive_channel_norm(p["norm"], h, cond)
    h = linear(p["pw_conv1"], h)
    h = gelu(h)
    h = linear(p["pw_conv2"], h)
    return h * p["scale"] + x


def causal_conv1d(p: Params, x: jax.Array, dilation: int = 1) -> jax.Array:
    """CausalConv1d (module/common.py:85-92): left reflect-pad then conv.

    x [N, T, Cin], p['w'] [k, Cin, Cout].
    """
    k = p["w"].shape[0]
    pad = k * dilation - dilation
    if pad:
        left = x[:, 1 : pad + 1][:, ::-1]  # ReflectionPad1d([pad, 0])
        x = jnp.concatenate([left, x], axis=1)
    return conv1d(x, p["w"], p["b"], dilation=dilation)


# ---------------------------------------------------------------------------
# initializers (torch Conv1d defaults)
# ---------------------------------------------------------------------------


def _conv_init(key, shape, fan_in):
    bound = 1.0 / jnp.sqrt(float(fan_in))
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def init_linear(key, cin: int, cout: int) -> Params:
    kw, kb = jax.random.split(key)
    return {"w": _conv_init(kw, (cin, cout), cin), "b": _conv_init(kb, (cout,), cin)}


def init_conv1d(key, cin: int, cout: int, k: int, groups: int = 1) -> Params:
    kw, kb = jax.random.split(key)
    fan_in = (cin // groups) * k
    if groups == cin and cout == cin:  # depthwise
        return {"w": _conv_init(kw, (k, cin), fan_in), "b": _conv_init(kb, (cin,), fan_in)}
    return {
        "w": _conv_init(kw, (k, cin // groups, cout), fan_in),
        "b": _conv_init(kb, (cout,), fan_in),
    }


init_causal_conv1d = init_conv1d


def init_channel_norm(channels: int) -> Params:
    return {"scale": jnp.ones(channels), "shift": jnp.zeros(channels)}


def init_adaptive_channel_norm(key, channels: int, condition_emb: int) -> Params:
    ks, kh = jax.random.split(key)
    return {
        "scale": init_linear(ks, condition_emb, channels),
        "shift": init_linear(kh, condition_emb, channels),
    }


def init_convnext1d(
    key, channels: int = 512, hidden: int = 1536, kernel_size: int = 7, scale: float = 1.0
) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "dw_conv": init_conv1d(k1, channels, channels, kernel_size, groups=channels),
        "norm": init_channel_norm(channels),
        "pw_conv1": init_linear(k2, channels, hidden),
        "pw_conv2": init_linear(k3, hidden, channels),
        "scale": jnp.full((channels,), scale, jnp.float32),
    }


def init_adaptive_convnext1d(
    key,
    channels: int = 512,
    hidden: int = 1536,
    condition_emb: int = 512,
    kernel_size: int = 7,
    scale: float = 1.0,
) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "dw_conv": init_conv1d(k1, channels, channels, kernel_size, groups=channels),
        "norm": init_adaptive_channel_norm(k2, channels, condition_emb),
        "pw_conv1": init_linear(k3, channels, hidden),
        "pw_conv2": init_linear(k4, hidden, channels),
        "scale": jnp.full((channels,), scale, jnp.float32),
    }
