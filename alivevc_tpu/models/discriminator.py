"""GAN discriminators: MultiPeriod (MPD) + MultiResolution (MRD).

Reference: module/discriminator.py:14-193.  Used only during decoder GAN
training / fine-tuning.  Channels-last layout: period sub-discriminators see
[N, T/p, p, C] images (conv over the T/p axis), resolution sub-discriminators
see [N, bins, frames, C] magnitude STFTs (rectangular window — the reference
passes no window to torch.stft here either, SURVEY §2.4.12).

Weight-normalized convs store (g, v) and compute w = g * v/||v|| at apply time
(per-output-channel norm, torch weight_norm dim=0 default).

Faithfully reproduced quirks (SURVEY §2.4.2):
  * MPD ``feat`` collects the five stage-conv outputs (pre-activation);
  * MRD ``feat`` returns the *final* activation only, and the multi-resolution
    wrapper iterates it over the batch dim — so MRD feature loss sees N
    per-item last-layer tensors, not a per-layer list.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from alivevc_tpu.config import DiscriminatorConfig
from alivevc_tpu.nn.layers import Params
from alivevc_tpu.ops.stft import stft_magnitude


# ---------------------------------------------------------------------------
# weight-normalized conv2d
# ---------------------------------------------------------------------------


def _wn_weight(p: Params) -> jax.Array:
    """w = g * v / ||v||, norm over all dims but the out-channel (last) axis.

    v layout: [kh, kw, cin_per_group, cout]; g: [cout].
    """
    v = p["v"]
    norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2), keepdims=True))
    return p["g"] * v / norm


def wn_conv2d(
    p: Params,
    x: jax.Array,
    stride: Tuple[int, int] = (1, 1),
    padding: Tuple[int, int] = (0, 0),
    groups: int = 1,
) -> jax.Array:
    """x [N, H, W, Cin], weight-normalized conv, torch padding semantics."""
    w = _wn_weight(p)
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    return y + p["b"]


def init_wn_conv2d(key, cin, cout, kh, kw, groups: int = 1) -> Params:
    k1, k2 = jax.random.split(key)
    fan_in = (cin // groups) * kh * kw
    bound = 1.0 / jnp.sqrt(float(fan_in))
    v = jax.random.uniform(k1, (kh, kw, cin // groups, cout), jnp.float32, -bound, bound)
    g = jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2)))  # torch weight_norm: g = ||w||
    b = jax.random.uniform(k2, (cout,), jnp.float32, -bound, bound)
    return {"v": v, "g": g, "b": b}


def leaky_relu(x: jax.Array, slope: float = 0.1) -> jax.Array:
    return jnp.where(x >= 0, x, x * slope)


def _get_padding(k: int) -> int:
    return (k - 1) // 2


# ---------------------------------------------------------------------------
# PeriodicDiscriminator (module/discriminator.py:14-83)
# ---------------------------------------------------------------------------


def init_periodic_discriminator(key, cfg: DiscriminatorConfig) -> Params:
    ch, ks, st, ns = (
        cfg.period_channels,
        cfg.period_kernel_size,
        cfg.period_stride,
        cfg.period_stages,
    )
    mc = cfg.period_max_channels
    keys = iter(jax.random.split(key, ns + 4))
    params = {
        "input_layer": init_wn_conv2d(next(keys), 1, ch, ks, 1),
        "layers": [],
    }
    for i in range(ns):
        c = min(ch * (4 ** i), mc)
        c_next = min(ch * (4 ** (i + 1)), mc)
        g = cfg.period_groups[i]
        if i == ns - 1:
            params["layers"].append(init_wn_conv2d(next(keys), c, c, ks, 1, groups=g))
        else:
            params["layers"].append(init_wn_conv2d(next(keys), c, c_next, ks, 1, groups=g))
    c = min(ch * (4 ** (ns - 1)), mc)
    params["final_conv"] = init_wn_conv2d(next(keys), c, c, 5, 1)
    params["output_layer"] = init_wn_conv2d(next(keys), c, 1, 3, 1)
    return params


def _to_period_image(x: jax.Array, period: int) -> jax.Array:
    """wave [N, L] → [N, L/p, p, 1] (zero-pad L to a multiple of p)."""
    n, length = x.shape
    pad = (-length) % period
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    # reference: view(N, p, -1) → [N, 1, p, L/p] → transpose → [N, 1, L/p, p]
    img = x.reshape(n, period, -1)            # [N, p, L/p]
    return jnp.transpose(img, (0, 2, 1))[..., None]  # [N, L/p, p, 1]


def periodic_discriminator(
    p: Params, x: jax.Array, period: int, cfg: DiscriminatorConfig, want_feat: bool
):
    ks, st = cfg.period_kernel_size, cfg.period_stride
    img = _to_period_image(x, period)
    pad = _get_padding(ks)
    # torch int padding pads BOTH dims — the period axis is padded too
    h = wn_conv2d(p["input_layer"], img, stride=(st, 1), padding=(pad, pad))
    feats: List[jax.Array] = []
    n_layers = len(p["layers"])
    for i, lp in enumerate(p["layers"]):
        g = cfg.period_groups[i]
        h = wn_conv2d(lp, h, stride=(st, 1), padding=(pad, pad), groups=g)
        feats.append(h)
        if i != n_layers - 1:
            h = leaky_relu(h, cfg.lrelu_slope)
    if want_feat:
        return feats
    h = wn_conv2d(p["final_conv"], h, padding=(2, 2))
    h = leaky_relu(h, cfg.lrelu_slope)
    return wn_conv2d(p["output_layer"], h, padding=(1, 1))


# ---------------------------------------------------------------------------
# ResolutionDiscriminator (module/discriminator.py:120-153)
# ---------------------------------------------------------------------------

_RES_LAYERS = [
    # (kh, kw, sh, sw, ph, pw)
    (7, 5, 2, 2, 3, 2),
    (5, 3, 2, 1, 2, 1),
    (5, 3, 2, 2, 2, 1),
    (3, 3, 2, 1, 1, 1),
    (3, 3, 2, 2, 1, 1),
]


def init_resolution_discriminator(key, cfg: DiscriminatorConfig) -> Params:
    ch = cfg.resolution_channels
    keys = iter(jax.random.split(key, len(_RES_LAYERS) + 2))
    layers = []
    cin = 1
    for (kh, kw, _, _, _, _) in _RES_LAYERS:
        layers.append(init_wn_conv2d(next(keys), cin, ch, kh, kw))
        cin = ch
    return {
        "layers": layers,
        "conv_post": init_wn_conv2d(next(keys), ch, 1, 3, 3),
    }


def resolution_discriminator(
    p: Params, x: jax.Array, n_fft: int, cfg: DiscriminatorConfig, want_feat: bool
):
    # torch.stft(x, n_fft, n_fft//4): rectangular window, center, no frame drop
    mag = stft_magnitude(x, n_fft, n_fft // 4, None, "rect", True, "reflect")
    h = jnp.transpose(mag, (0, 2, 1))[..., None]  # [N, bins, frames, 1]
    for lp, (kh, kw, sh, sw, ph, pw) in zip(p["layers"], _RES_LAYERS):
        h = wn_conv2d(lp, h, stride=(sh, sw), padding=(ph, pw))
        h = leaky_relu(h, cfg.lrelu_slope)
    if want_feat:
        # reference quirk: returns the final activation tensor, not a list
        return h
    return wn_conv2d(p["conv_post"], h, padding=(1, 1))


# ---------------------------------------------------------------------------
# Discriminator top (module/discriminator.py:156-193)
# ---------------------------------------------------------------------------


def init_discriminator(key, cfg: DiscriminatorConfig = DiscriminatorConfig()) -> Params:
    keys = iter(jax.random.split(key, len(cfg.periods) + len(cfg.resolutions)))
    return {
        "mpd": [init_periodic_discriminator(next(keys), cfg) for _ in cfg.periods],
        "mrd": [init_resolution_discriminator(next(keys), cfg) for _ in cfg.resolutions],
    }


def discriminator_logits(
    params: Params, x: jax.Array, cfg: DiscriminatorConfig = DiscriminatorConfig()
) -> List[jax.Array]:
    """wave [N, L] → list of 11 logit tensors (8 MPD + 3 MRD)."""
    logits = [
        periodic_discriminator(p, x, pd, cfg, False)
        for p, pd in zip(params["mpd"], cfg.periods)
    ]
    logits += [
        resolution_discriminator(p, x, n, cfg, False)
        for p, n in zip(params["mrd"], cfg.resolutions)
    ]
    return logits


def _all_feats(params: Params, x: jax.Array, cfg: DiscriminatorConfig) -> List[jax.Array]:
    feats: List[jax.Array] = []
    for p, pd in zip(params["mpd"], cfg.periods):
        feats += periodic_discriminator(p, x, pd, cfg, True)
    for p, n in zip(params["mrd"], cfg.resolutions):
        # reference quirk: iterating the returned tensor over its batch dim
        final = resolution_discriminator(p, x, n, cfg, True)
        feats += [final[i] for i in range(final.shape[0])]
    return feats


def discriminator_feat_loss(
    params: Params,
    fake: jax.Array,
    real: jax.Array,
    cfg: DiscriminatorConfig = DiscriminatorConfig(),
) -> jax.Array:
    """Σ L1 over matched feature pairs; real branch is grad-blocked
    (module/discriminator.py:184-190)."""
    real_feats = [jax.lax.stop_gradient(f) for f in _all_feats(params, real, cfg)]
    fake_feats = _all_feats(params, fake, cfg)
    loss = 0.0
    for r, f in zip(real_feats, fake_feats):
        loss = loss + jnp.mean(jnp.abs(f - r))
    return loss
