"""WavLM in JAX — the distillation teacher, TPU-native.

A faithful port of ``microsoft/wavlm-base-plus`` (the reference's teacher,
module/hubert.py:6-22): 7-layer conv feature encoder (group-norm first
layer), feature projection, weight-normed conv positional embedding, and 12
post-LN transformer layers with WavLM's gated relative position bias
(T5-style log-bucketed relative attention, bias gated per query by a sigmoid
of a head-wise projection).  Verified against the torch implementation with
imported weights (tests/test_wavlm.py); checkpoints load through
``import_wavlm``.

With this the distillation loop (train/distill.py) runs entirely on TPU:
``wavlm_features`` reproduces extract_hubert_feature — mean of hidden states
4 and 9, linearly interpolated to wave_len//320 frames.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from alivevc_tpu.nn.layers import Params, conv1d, gelu, linear
from alivevc_tpu.ops.interp import linear_interpolate


@dataclasses.dataclass(frozen=True)
class WavLMConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    num_buckets: int = 320
    max_distance: int = 800
    layer_norm_eps: float = 1e-5


# ---------------------------------------------------------------------------
# pieces
# ---------------------------------------------------------------------------


def _layer_norm(p: Params, x: jax.Array, eps: float) -> jax.Array:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["w"] + p["b"]


def _feature_encoder(p: Params, wave: jax.Array, cfg: WavLMConfig) -> jax.Array:
    """wave [N, L] → features [N, T', 512] (≈49.8 Hz frames)."""
    x = wave[:, :, None]                                  # [N, L, 1]
    for i, layer in enumerate(p["conv_layers"]):
        x = conv1d(x, layer["conv"]["w"], layer["conv"].get("b"),
                   stride=cfg.conv_stride[i])
        if i == 0:
            # GroupNorm(512 groups over 512 ch) == per-channel norm over time
            mu = jnp.mean(x, axis=1, keepdims=True)
            var = jnp.mean((x - mu) ** 2, axis=1, keepdims=True)
            x = (x - mu) * jax.lax.rsqrt(var + 1e-5)
            x = x * layer["norm"]["w"] + layer["norm"]["b"]
        x = gelu(x)
    return x


def _pos_conv(p: Params, x: jax.Array, cfg: WavLMConfig) -> jax.Array:
    """Weight-normed grouped conv positional embedding (dim=2 weight norm)."""
    v = p["v"]                                            # [k, cin/g, cout]
    norm = jnp.sqrt(jnp.sum(v * v, axis=(1, 2), keepdims=True))
    w = p["g"] * v / norm                                 # g: [k, 1, 1]
    k = cfg.num_conv_pos_embeddings
    y = conv1d(x, w, p["b"], padding=k // 2,
               groups=cfg.num_conv_pos_embedding_groups)
    if k % 2 == 0:
        y = y[:, :-1]                                     # SamePadLayer
    return gelu(y)


@functools.lru_cache(maxsize=None)
def _rel_buckets_np(qlen: int, klen: int, num_buckets: int, max_distance: int):
    """T5-style log bucketing (WavLMAttention._relative_positions_bucket)."""
    nb = num_buckets // 2
    ctx = np.arange(qlen)[:, None]
    mem = np.arange(klen)[None, :]
    rel = mem - ctx
    buckets = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    with np.errstate(divide="ignore"):
        large = np.log(np.maximum(rel, 1).astype(np.float64) / max_exact) / math.log(
            max_distance / max_exact
        ) * (nb - max_exact)
    large = (max_exact + large).astype(np.int64)
    large = np.minimum(large, nb - 1)
    buckets += np.where(is_small, rel, large)
    return buckets  # [qlen, klen]


def _attention(
    p: Params, x: jax.Array, position_bias: jax.Array, cfg: WavLMConfig
) -> jax.Array:
    """Gated relative-position-bias self-attention (eval mode, no mask)."""
    n, t, d = x.shape
    h = cfg.num_heads
    hd = d // h

    # gate from the *unprojected* hidden states per head
    gated = x.reshape(n, t, h, hd).transpose(0, 2, 1, 3)         # [N, H, T, hd]
    proj = linear(p["gru_rel_pos_linear"], gated)                 # [N, H, T, 8]
    proj = proj.reshape(n, h, t, 2, 4).sum(-1)                    # [N, H, T, 2]
    gate_a, gate_b = jnp.split(jax.nn.sigmoid(proj), 2, axis=-1)  # [N,H,T,1]
    gate = gate_a * (gate_b * p["gru_rel_pos_const"] - 1.0) + 2.0  # [N,H,T,1]
    gated_bias = gate * position_bias[None]                       # [N,H,T,T]

    q = linear(p["q_proj"], x).reshape(n, t, h, hd).transpose(0, 2, 1, 3)
    k = linear(p["k_proj"], x).reshape(n, t, h, hd).transpose(0, 2, 1, 3)
    v = linear(p["v_proj"], x).reshape(n, t, h, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("nhqd,nhkd->nhqk", q, k) / math.sqrt(hd)
    attn = jax.nn.softmax(scores + gated_bias, axis=-1)
    out = jnp.einsum("nhqk,nhkd->nhqd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(n, t, d)
    return linear(p["out_proj"], out)


def _encoder_layer(
    p: Params, x: jax.Array, position_bias: jax.Array, cfg: WavLMConfig
) -> jax.Array:
    """Post-LN layer (do_stable_layer_norm=False for base-plus)."""
    attn = _attention(p["attention"], x, position_bias, cfg)
    x = _layer_norm(p["layer_norm"], x + attn, cfg.layer_norm_eps)
    ff = linear(p["ff_out"], gelu(linear(p["ff_in"], x)))
    return _layer_norm(p["final_layer_norm"], x + ff, cfg.layer_norm_eps)


def wavlm_hidden_states(
    params: Params, wave: jax.Array, cfg: WavLMConfig = WavLMConfig()
) -> List[jax.Array]:
    """wave [N, L] → 13 hidden states [N, T', 768] (matching torch
    ``WavLMModel(..., output_hidden_states=True).hidden_states``)."""
    feats = _feature_encoder(params["feature_encoder"], wave, cfg)
    x = _layer_norm(params["fp_norm"], feats, cfg.layer_norm_eps)
    x = linear(params["fp_proj"], x)

    x = x + _pos_conv(params["pos_conv"], x, cfg)
    x = _layer_norm(params["enc_norm"], x, cfg.layer_norm_eps)

    t = x.shape[1]
    buckets = jnp.asarray(
        _rel_buckets_np(t, t, cfg.num_buckets, cfg.max_distance)
    )
    position_bias = jnp.transpose(params["rel_attn_embed"][buckets], (2, 0, 1))

    hidden = [x]
    for layer in params["layers"]:
        x = _encoder_layer(layer, x, position_bias, cfg)
        hidden.append(x)
    return hidden


@functools.partial(jax.jit, static_argnames=("segment_size",))
def wavlm_features(
    params: Params, wave: jax.Array, segment_size: int = 320
) -> jax.Array:
    """extract_hubert_feature semantics (module/hubert.py:15-22):
    (h[4] + h[9]) / 2, time-interpolated to wave_len // segment_size frames.
    wave [N, L] → [N, L//320, 768]."""
    hs = wavlm_hidden_states(params, wave)
    feat = (hs[4] + hs[9]) * 0.5
    return linear_interpolate(feat, wave.shape[1] // segment_size, axis=1)


# ---------------------------------------------------------------------------
# torch checkpoint importer
# ---------------------------------------------------------------------------


def import_wavlm(sd: Dict[str, np.ndarray], cfg: WavLMConfig = WavLMConfig()) -> Params:
    """HF WavLMModel state_dict (numpy) → parameter pytree."""
    J = jnp.asarray

    def lin(prefix):
        return {"w": J(sd[f"{prefix}.weight"].T), "b": J(sd[f"{prefix}.bias"])}

    def ln(prefix):
        return {"w": J(sd[f"{prefix}.weight"]), "b": J(sd[f"{prefix}.bias"])}

    conv_layers = []
    for i in range(len(cfg.conv_dim)):
        pre = f"feature_extractor.conv_layers.{i}"
        layer: Params = {
            "conv": {"w": J(np.transpose(sd[f"{pre}.conv.weight"], (2, 1, 0)))}
        }
        if f"{pre}.conv.bias" in sd:
            layer["conv"]["b"] = J(sd[f"{pre}.conv.bias"])
        if i == 0:
            layer["norm"] = {
                "w": J(sd[f"{pre}.layer_norm.weight"]),
                "b": J(sd[f"{pre}.layer_norm.bias"]),
            }
        conv_layers.append(layer)

    # pos conv: torch weight_norm dim=2 → g [1, 1, k]; v [out, in/g, k]
    pc = "encoder.pos_conv_embed.conv"
    if f"{pc}.parametrizations.weight.original0" in sd:
        g_t = sd[f"{pc}.parametrizations.weight.original0"]
        v_t = sd[f"{pc}.parametrizations.weight.original1"]
    else:
        g_t = sd[f"{pc}.weight_g"]
        v_t = sd[f"{pc}.weight_v"]
    pos_conv = {
        "g": J(np.transpose(g_t, (2, 1, 0))),              # [k, 1, 1]
        "v": J(np.transpose(v_t, (2, 1, 0))),              # [k, in/g, out]
        "b": J(sd[f"{pc}.bias"]),
    }

    layers = []
    for i in range(cfg.num_layers):
        pre = f"encoder.layers.{i}"
        att = {
            "q_proj": lin(f"{pre}.attention.q_proj"),
            "k_proj": lin(f"{pre}.attention.k_proj"),
            "v_proj": lin(f"{pre}.attention.v_proj"),
            "out_proj": lin(f"{pre}.attention.out_proj"),
            "gru_rel_pos_linear": lin(f"{pre}.attention.gru_rel_pos_linear"),
            "gru_rel_pos_const": J(
                sd[f"{pre}.attention.gru_rel_pos_const"].reshape(1, cfg.num_heads, 1, 1)
            ),
        }
        layers.append(
            {
                "attention": att,
                "layer_norm": ln(f"{pre}.layer_norm"),
                "ff_in": lin(f"{pre}.feed_forward.intermediate_dense"),
                "ff_out": lin(f"{pre}.feed_forward.output_dense"),
                "final_layer_norm": ln(f"{pre}.final_layer_norm"),
            }
        )

    return {
        "feature_encoder": {"conv_layers": conv_layers},
        "fp_norm": ln("feature_projection.layer_norm"),
        "fp_proj": lin("feature_projection.projection"),
        "pos_conv": pos_conv,
        "enc_norm": ln("encoder.layer_norm"),
        "rel_attn_embed": J(sd["encoder.layers.0.attention.rel_attn_embed.weight"]),
        "layers": layers,
    }
