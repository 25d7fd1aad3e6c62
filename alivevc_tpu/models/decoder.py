"""CordVox DDSP decoder: FeatureExtractor → HarmonicOscillator → Filter U-Net.

Reference: module/decoder.py:13-210.  TPU-first design choices:

  * channels-last everywhere ([N, T, C]);
  * the U-Net's rate-changing convolutions (kernel == stride, zero padding)
    are expressed as reshape+matmul instead of strided/transposed convs — on
    TPU that is a straight MXU op with no im2col or scatter;
  * the oscillator's phase integration runs in float32 (matching the
    reference's fp32 islands, SURVEY §2.4.13) via a cumulative sum over the
    sample axis; ``crop`` re-zeroes the phase at the stream-output boundary and
    ``phi`` carries the principal-value pseudo-phase (asin∘sin) across chunks
    exactly like the streaming CLI (module/decoder.py:91-95,
    realtime_inference.py:166-167).

Parameter layouts:
  * down conv (k=r, s=r):  ``w`` [r*Cin, Cout] (tap-major: row j*Cin+ci ↔
    torch weight[co, ci, j]), ``b`` [Cout]
  * up conv (transposed, k=r, s=r): ``w`` [Cin, r*Cout] (col j*Cout+co ↔
    torch weight[ci, co, j]), ``b`` [Cout]
"""

from __future__ import annotations

import math
import numpy as np
from typing import Tuple

import jax
import jax.numpy as jnp

from alivevc_tpu.config import DecoderConfig
from alivevc_tpu.nn.layers import (
    Params,
    adaptive_convnext1d,
    causal_conv1d,
    conv1d,
    gelu,
    init_adaptive_convnext1d,
    init_conv1d,
    init_linear,
    linear,
)
from alivevc_tpu.ops.interp import linear_interpolate


# ---------------------------------------------------------------------------
# F0Encoder (module/decoder.py:13-24)
# ---------------------------------------------------------------------------


def init_f0_encoder(key, output_dim: int = 512) -> Params:
    k1, k1b, k2 = jax.random.split(key, 3)
    # c1 weight is re-initialised to N(0, 0.3) in the reference (decoder.py:18)
    w1 = jax.random.normal(k1, (1, output_dim)) * 0.3
    b1 = jax.random.uniform(k1b, (output_dim,), jnp.float32, -1.0, 1.0)
    return {"c1": {"w": w1, "b": b1}, "c2": init_linear(k2, output_dim, output_dim)}


def f0_encoder(p: Params, f0: jax.Array) -> jax.Array:
    """f0 [N, T, 1] → sinusoidal condition embedding [N, T, C]."""
    x = linear(p["c1"], f0)
    x = jnp.sin(x)
    return linear(p["c2"], x)


# ---------------------------------------------------------------------------
# FeatureExtractor (module/decoder.py:27-48)
# ---------------------------------------------------------------------------


def init_feature_extractor(key, cfg: DecoderConfig) -> Params:
    keys = jax.random.split(key, cfg.num_layers + 2)
    return {
        "input_layer": init_linear(keys[0], cfg.content_channels, cfg.channels),
        "f0_enc": init_f0_encoder(keys[1], cfg.channels),
        "mid_layers": [
            init_adaptive_convnext1d(
                keys[2 + i],
                cfg.channels,
                cfg.hidden_channels,
                cfg.channels,
                cfg.kernel_size,
                scale=1.0 / cfg.num_layers,
            )
            for i in range(cfg.num_layers)
        ],
    }


def feature_extractor(p: Params, content: jax.Array, f0: jax.Array) -> jax.Array:
    """content [N, T, 768], f0 [N, T, 1] → features [N, T, 512]."""
    x = linear(p["input_layer"], content)
    # the sinusoidal F0 encoding needs fp32 (bf16 quantizes Hz to ~16 steps);
    # the resulting condition embedding can ride at the activation dtype
    cond = f0_encoder(p["f0_enc"], f0.astype(jnp.float32)).astype(x.dtype)
    for block in p["mid_layers"]:
        x = adaptive_convnext1d(block, x, cond)
    return x


# ---------------------------------------------------------------------------
# HarmonicOscillator (module/decoder.py:51-102)
# ---------------------------------------------------------------------------


def init_harmonic_oscillator(key, cfg: DecoderConfig) -> Params:
    return {"to_amps": init_linear(key, cfg.channels, cfg.num_harmonics)}


def harmonic_oscillator(
    p: Params,
    features: jax.Array,
    f0: jax.Array,
    phi=0.0,
    crop: Tuple[int, int] = (0, -1),
    segment_size: int = 320,
    sample_rate: int = 16_000,
    num_harmonics: int = 64,
) -> Tuple[jax.Array, jax.Array]:
    """DDSP harmonic source.

    features [N, Lf, C], f0 [N, Lf, 1] → (wave [N, Lw, 1], phi [N, Lw, Nh])
    with Lw = Lf * segment_size.  ``phi`` input is 0.0 or [N, 1, Nh]
    (pseudo-phase carried across streaming chunks); the returned phi is
    asin(sin(theta)) for every sample, from which the streaming pipeline
    samples index ``end_of_output``.
    """
    lf = features.shape[1]
    lw = lf * segment_size

    amps = jnp.exp(linear(p["to_amps"], features))          # [N, Lf, Nh]
    mul = jnp.arange(1, num_harmonics + 1, dtype=jnp.float32)
    formants = f0.astype(jnp.float32) * mul                  # [N, Lf, Nh]

    formants = linear_interpolate(formants, lw, axis=1)
    amps = linear_interpolate(amps.astype(jnp.float32), lw, axis=1)

    dt = jnp.cumsum(formants / sample_rate, axis=1)          # fp32 phase accum
    dt = dt - dt[:, crop[0]][:, None, :]
    theta = 2.0 * math.pi * dt + phi
    harmonics = jnp.sin(theta)
    phi_out = jnp.arcsin(harmonics)                          # principal value

    wave = jnp.mean(harmonics * amps, axis=2, keepdims=True)  # [N, Lw, 1]
    return wave, phi_out


# ---------------------------------------------------------------------------
# Filter U-Net (module/decoder.py:105-195)
# ---------------------------------------------------------------------------


def init_modulated_causal_conv1d(key, cin, cout, cond, k=5) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv": init_conv1d(k1, cin, cout, k),
        "to_scale": init_linear(k2, cond, cin),
        "to_shift": init_linear(k3, cond, cin),
    }


def modulated_causal_conv1d(
    p: Params, x: jax.Array, c: jax.Array, dilation: int = 1
) -> jax.Array:
    """FiLM (scale+1 / shift interpolated to signal length) then causal conv
    (module/decoder.py:105-119).  x [N, Lx, Cin], c [N, Lf, Cc]."""
    scale = linear(p["to_scale"], c) + 1.0
    shift = linear(p["to_shift"], c)
    scale = linear_interpolate(scale, x.shape[1], axis=1)
    shift = linear_interpolate(shift, x.shape[1], axis=1)
    x = x * scale + shift
    return causal_conv1d_packed(p["conv"], x, dilation=dilation)


def _packed_matrices(w: jax.Array, p: int, dilation: int):
    """Causal conv as lane-packed block matmuls.

    A causal conv (kernel k, dilation d) over [N, L, C] with C < 128 wastes
    most of the VPU/MXU lanes.  Packing P = 128//C consecutive timesteps into
    the lane dim turns it into (n_prev+1) full-width [P*C, P*C] matmuls:

        y_block = Σ_s  x_block_{-s} @ M_s

    where M_s[(t_in*C+ci), (t_out*C+co)] = w[j, ci, co] for every tap j whose
    input lands s blocks back.  Built with an einsum against a constant
    one-hot selection tensor so it stays inside jit.
    """
    k, c, _ = w.shape
    lookback = (k - 1) * dilation
    n_prev = -(-lookback // p)
    sels = np.zeros((n_prev + 1, k, p, p), np.float32)
    for j in range(k):
        off = (k - 1 - j) * dilation
        for t_out in range(p):
            t_in = t_out - off
            s = 0
            while t_in < 0:
                t_in += p
                s += 1
            sels[s, j, t_in, t_out] = 1.0
    mats = jnp.einsum("sjab,jio->saibo", jnp.asarray(sels), w).astype(w.dtype)
    return mats.reshape(n_prev + 1, p * c, p * c), n_prev


def causal_conv1d_packed(p_: Params, x: jax.Array, dilation: int = 1) -> jax.Array:
    """Lane-packed causal conv; exact same math as causal_conv1d for inputs
    whose reflect padding lies entirely in the first block (L >= lookback+1,
    always true for the filter's sample-rate levels).

    TPU-only: the packing targets the 128-lane VPU/MXU; on CPU it just bloats
    compile time, so other backends take the plain conv (parity-tested on CPU
    with ALIVEVC_FORCE_PACKED=1)."""
    import os

    n, length, c = x.shape
    pk = 128 // c
    if os.environ.get("ALIVEVC_FORCE_PLAIN"):
        return causal_conv1d(p_, x, dilation)
    if (
        jax.default_backend() != "tpu"
        and not os.environ.get("ALIVEVC_FORCE_PACKED")
    ):
        return causal_conv1d(p_, x, dilation)
    if c >= 128 or 128 % c or length % pk:
        return causal_conv1d(p_, x, dilation)
    w = p_["w"]
    k = w.shape[0]
    pad = k * dilation - dilation
    # left reflect pad, then trim to a whole number of blocks by padding zeros
    left = x[:, 1 : pad + 1][:, ::-1]
    xp = jnp.concatenate([left, x], axis=1)
    extra = (-xp.shape[1]) % pk
    xp = jnp.pad(xp, ((0, 0), (extra, 0), (0, 0)))
    offset = pad + extra                      # output t is at padded index t+offset
    mats, n_prev = _packed_matrices(w, pk, dilation)
    xb = xp.reshape(n, xp.shape[1] // pk, pk * c)
    y = (xb @ mats[0]).astype(x.dtype)
    for s in range(1, n_prev + 1):
        shifted = jnp.pad(xb, ((0, 0), (s, 0), (0, 0)))[:, : xb.shape[1]]
        y = y + shifted @ mats[s]
    y = y.reshape(n, xp.shape[1], c)[:, offset : offset + length]
    return y + p_["b"]


def init_filter_res_block(key, channels, cond, k=5) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "c1": init_modulated_causal_conv1d(k1, channels, channels, cond, k),
        "c2": init_modulated_causal_conv1d(k2, channels, channels, cond, k),
    }


def filter_res_block(p: Params, x: jax.Array, c: jax.Array, dilation: int) -> jax.Array:
    res = x
    x = gelu(x)
    x = modulated_causal_conv1d(p["c1"], x, c, dilation)
    x = gelu(x)
    x = modulated_causal_conv1d(p["c2"], x, c, dilation)
    return x + res


def init_filter_block(key, cin, cout, cond, k=5, dilations=3) -> Params:
    keys = jax.random.split(key, dilations + 1)
    return {
        "input_conv": init_linear(keys[0], cin, cout),
        "blocks": [
            init_filter_res_block(keys[1 + d], cout, cond, k) for d in range(dilations)
        ],
    }


def filter_block(p: Params, x: jax.Array, c: jax.Array) -> jax.Array:
    x = linear(p["input_conv"], x)
    for d, blk in enumerate(p["blocks"]):
        x = filter_res_block(blk, x, c, dilation=2 ** d)
    return x


def _down(p: Params, x: jax.Array, rate: int) -> jax.Array:
    """Conv1d(cin, cout, r, stride=r, pad=0) as reshape+matmul."""
    n, length, cin = x.shape
    x = x.reshape(n, length // rate, rate * cin)
    return x @ p["w"] + p["b"]


def _up(p: Params, x: jax.Array, rate: int) -> jax.Array:
    """ConvTranspose1d(cin, cout, r, stride=r, pad=0) as matmul+reshape."""
    n, length, _ = x.shape
    y = x @ p["w"]                                   # [N, T, r*cout]
    cout = y.shape[-1] // rate
    y = y.reshape(n, length * rate, cout)
    return y + p["b"]


def init_filter(key, cfg: DecoderConfig) -> Params:
    rates = list(cfg.filter_rates)
    chans = list(cfg.filter_channels)
    k = cfg.filter_kernel_size
    keys = iter(jax.random.split(key, 64))

    downs = []
    chan_nexts = chans[1:] + [chans[-1]]
    for c, c_next, r in zip(chans, chan_nexts, rates):
        # torch Conv1d(c, c_next, r, r, 0): fan_in = c * r
        p = init_conv1d(next(keys), c, c_next, r)     # w [r, c, c_next]
        downs.append({"w": p["w"].reshape(r * c, c_next), "b": p["b"]})

    rchans = list(reversed(chans))
    rrates = list(reversed(rates))
    chan_prevs = [rchans[0]] + rchans[:-1]
    ups, blocks = [], []
    for c, c_prev, r in zip(rchans, chan_prevs, rrates):
        # torch ConvTranspose1d(c_prev, c, r, r, 0): weight [c_prev, c, r];
        # torch fan_in for transposed conv = out_channels * k = c * r
        kw, kb = jax.random.split(next(keys))
        bound = 1.0 / math.sqrt(c * r)
        w = jax.random.uniform(kw, (c_prev, r, c), jnp.float32, -bound, bound)
        b = jax.random.uniform(kb, (c,), jnp.float32, -bound, bound)
        ups.append({"w": w.reshape(c_prev, r * c), "b": b})
        blocks.append(
            init_filter_block(next(keys), c, c, cfg.channels, k, cfg.filter_dilations)
        )

    return {
        "source_in": init_conv1d(next(keys), 1, chans[0], 7),
        "downs": downs,
        "mid_conv": init_conv1d(next(keys), chans[-1], chans[-1], k),
        "ups": ups,
        "blocks": blocks,
        "source_out": init_conv1d(next(keys), chans[0], 1, 7),
    }


def filter_unet(p: Params, source: jax.Array, c: jax.Array, cfg: DecoderConfig) -> jax.Array:
    """source [N, Lw, 1], c [N, Lf, 512] → filtered wave [N, Lw, 1]
    (module/decoder.py:184-195)."""
    rates = list(cfg.filter_rates)
    x = conv1d(source, p["source_in"]["w"], p["source_in"]["b"], padding=3)
    skips = []
    for dp, r in zip(p["downs"], rates):
        x = _down(dp, x, r)
        skips.append(x)
    x = causal_conv1d(p["mid_conv"], x)
    for up, blk, s, r in zip(p["ups"], p["blocks"], reversed(skips), reversed(rates)):
        x = _up(up, x + s, r)
        x = filter_block(blk, x, c)
    return conv1d(x, p["source_out"]["w"], p["source_out"]["b"], padding=3)


# ---------------------------------------------------------------------------
# Decoder top (module/decoder.py:198-210)
# ---------------------------------------------------------------------------


def init_decoder(key, cfg: DecoderConfig = DecoderConfig()) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "feature_extractor": init_feature_extractor(k1, cfg),
        "harmonic_oscillator": init_harmonic_oscillator(k2, cfg),
        "filter": init_filter(k3, cfg),
    }


def select_filter_impl(cfg: DecoderConfig, lw: int) -> str:
    """'packed' (lane-dense, models/filter_packed.py) on TPU when the config
    maps onto the packed layout, else 'plain'.  ALIVEVC_FILTER_IMPL overrides
    ('packed'|'plain')."""
    import os

    from alivevc_tpu.models.filter_packed import packed_supported

    forced = os.environ.get("ALIVEVC_FILTER_IMPL")
    if forced in ("packed", "plain"):
        if forced == "packed" and not packed_supported(cfg, lw):
            return "plain"
        return forced
    if jax.default_backend() == "tpu" and packed_supported(cfg, lw):
        return "packed"
    return "plain"


def decoder(
    params: Params,
    content: jax.Array,
    f0: jax.Array,
    phi=0.0,
    crop: Tuple[int, int] = (0, -1),
    cfg: DecoderConfig = DecoderConfig(),
    oscillator_impl: str = "xla",
    filter_impl: str = "auto",
) -> Tuple[jax.Array, jax.Array]:
    """content [N, Lf, 768], f0 [N, Lf, 1] → (wave [N, Lw], phi [N, Lw, Nh]).

    oscillator_impl='pallas' uses the fused TPU source-synthesis kernel
    (kernels/oscillator_pallas.py) — valid only for the offline path
    (phi=0, crop=(0,-1)); phi_out is then returned as None.
    filter_impl: 'auto' (lane-dense packed U-Net on TPU, plain elsewhere),
    'packed', or 'plain'.
    """
    feats = feature_extractor(params["feature_extractor"], content, f0)
    if oscillator_impl == "pallas":
        assert crop == (0, -1), "pallas oscillator serves the offline path only"
        # Chebyshev variant: formants are exactly f0·k, so only the
        # fundamental phase is integrated and sin(kθ) comes from the
        # 2cos(θ)·sin((k−1)θ) − sin((k−2)θ) recurrence (one sin+cos per
        # sample instead of num_harmonics transcendentals)
        from alivevc_tpu.kernels.oscillator_pallas import harmonic_source_cheb_pallas

        amps = jnp.exp(linear(params["harmonic_oscillator"]["to_amps"], feats))
        source = harmonic_source_cheb_pallas(f0, amps, cfg.sample_rate)
        phi_out = None
    else:
        source, phi_out = harmonic_oscillator(
            params["harmonic_oscillator"],
            feats,
            f0,
            phi=phi,
            crop=crop,
            segment_size=cfg.segment_size,
            sample_rate=cfg.sample_rate,
            num_harmonics=cfg.num_harmonics,
        )
    lw = feats.shape[1] * cfg.segment_size
    if filter_impl == "auto":
        filter_impl = select_filter_impl(cfg, lw)
    if filter_impl == "packed":
        from alivevc_tpu.models.filter_packed import filter_unet_packed

        out = filter_unet_packed(
            params["filter"], source.astype(feats.dtype), feats, cfg
        )
    else:
        out = filter_unet(params["filter"], source.astype(feats.dtype), feats, cfg)
    return out[..., 0], phi_out
