"""Reverse interop: parameter pytrees → reference-format torch state_dicts.

The inverse of compat/torch_import.py — weights trained in this framework can
be saved as ``content_encoder.pt`` / ``f0_estimator.pt`` / ``decoder.pt`` /
``voice_library.pt`` and loaded by the PyTorch reference unchanged, so a
reference user can adopt TPU-trained models without switching runtimes.
Round-trip (import ∘ export == identity) is tested in tests/test_io.py.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from alivevc_tpu.config import DecoderConfig

StateDict = Dict[str, np.ndarray]


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _lin(sd: StateDict, prefix: str, p) -> None:
    sd[f"{prefix}.weight"] = _np(p["w"]).T[:, :, None]    # [out, in, 1]
    sd[f"{prefix}.bias"] = _np(p["b"])


def _conv(sd: StateDict, prefix: str, p) -> None:
    sd[f"{prefix}.weight"] = np.transpose(_np(p["w"]), (2, 1, 0))
    sd[f"{prefix}.bias"] = _np(p["b"])


def _dw(sd: StateDict, prefix: str, p) -> None:
    sd[f"{prefix}.weight"] = np.transpose(_np(p["w"])[:, None, :], (2, 1, 0))
    sd[f"{prefix}.bias"] = _np(p["b"])


def _norm(sd: StateDict, prefix: str, p) -> None:
    sd[f"{prefix}.scale"] = _np(p["scale"])[None, :, None]
    sd[f"{prefix}.shift"] = _np(p["shift"])[None, :, None]


def _convnext(sd: StateDict, prefix: str, p) -> None:
    _dw(sd, f"{prefix}.dw_conv", p["dw_conv"])
    _norm(sd, f"{prefix}.norm", p["norm"])
    _lin(sd, f"{prefix}.pw_conv1", p["pw_conv1"])
    _lin(sd, f"{prefix}.pw_conv2", p["pw_conv2"])
    sd[f"{prefix}.scale"] = _np(p["scale"])[None, :, None]


def _adaptive_convnext(sd: StateDict, prefix: str, p) -> None:
    _dw(sd, f"{prefix}.dw_conv", p["dw_conv"])
    _lin(sd, f"{prefix}.norm.scale", p["norm"]["scale"])
    _lin(sd, f"{prefix}.norm.shift", p["norm"]["shift"])
    _lin(sd, f"{prefix}.pw_conv1", p["pw_conv1"])
    _lin(sd, f"{prefix}.pw_conv2", p["pw_conv2"])
    sd[f"{prefix}.scale"] = _np(p["scale"])[None, :, None]


def export_content_encoder(params) -> StateDict:
    sd: StateDict = {}
    _lin(sd, "input_layer", params["input_layer"])
    for i, blk in enumerate(params["mid_layers"]):
        _convnext(sd, f"mid_layers.{i}", blk)
    _lin(sd, "output_layer", params["output_layer"])
    return sd


def export_f0_estimator(params) -> StateDict:
    sd: StateDict = {}
    _lin(sd, "input_layer", params["input_layer"])
    for i, blk in enumerate(params["mid_layers"]):
        _convnext(sd, f"mid_layers.{i}", blk)
    _norm(sd, "last_norm", params["last_norm"])
    _lin(sd, "output_layer", params["output_layer"])
    return sd


def export_voice_library(params) -> StateDict:
    return {"tokens": _np(params["tokens"]).T[None]}       # [1, 768, 512]


def export_decoder(params, cfg: DecoderConfig = DecoderConfig()) -> StateDict:
    sd: StateDict = {}
    fe = params["feature_extractor"]
    _lin(sd, "feature_extractor.input_layer", fe["input_layer"])
    _lin(sd, "feature_extractor.f0_enc.c1", fe["f0_enc"]["c1"])
    _lin(sd, "feature_extractor.f0_enc.c2", fe["f0_enc"]["c2"])
    for i, blk in enumerate(fe["mid_layers"]):
        _adaptive_convnext(sd, f"feature_extractor.mid_layers.{i}", blk)

    _lin(sd, "harmonic_oscillator.to_amps", params["harmonic_oscillator"]["to_amps"])

    filt = params["filter"]
    _conv(sd, "filter.source_in", filt["source_in"])
    chans = list(cfg.filter_channels)
    chan_nexts = chans[1:] + [chans[-1]]
    for i, (dp, c, c_next, r) in enumerate(
        zip(filt["downs"], chans, chan_nexts, cfg.filter_rates)
    ):
        w = _np(dp["w"]).reshape(r, c, c_next)              # [r, cin, cout]
        sd[f"filter.downs.{i}.weight"] = np.transpose(w, (2, 1, 0))
        sd[f"filter.downs.{i}.bias"] = _np(dp["b"])
    _conv(sd, "filter.mid_conv.conv", filt["mid_conv"])

    rchans = list(reversed(chans))
    rrates = list(reversed(list(cfg.filter_rates)))
    chan_prevs = [rchans[0]] + rchans[:-1]
    for i, (up, c, c_prev, r) in enumerate(
        zip(filt["ups"], rchans, chan_prevs, rrates)
    ):
        w = _np(up["w"]).reshape(c_prev, r, c)              # [cin, r, cout]
        sd[f"filter.ups.{i}.weight"] = np.transpose(w, (0, 2, 1))
        sd[f"filter.ups.{i}.bias"] = _np(up["b"])
    for i, blk in enumerate(filt["blocks"]):
        _lin(sd, f"filter.blocks.{i}.input_conv", blk["input_conv"])
        for d, rb in enumerate(blk["blocks"]):
            for name in ("c1", "c2"):
                mc = rb[name]
                _conv(sd, f"filter.blocks.{i}.blocks.{d}.{name}.conv.conv", mc["conv"])
                _lin(sd, f"filter.blocks.{i}.blocks.{d}.{name}.to_scale", mc["to_scale"])
                _lin(sd, f"filter.blocks.{i}.blocks.{d}.{name}.to_shift", mc["to_shift"])
    _conv(sd, "filter.source_out", filt["source_out"])
    return sd


def save_torch_state_dict(path: str, sd: StateDict) -> None:
    """Write a torch-loadable .pt (requires torch on the host)."""
    import torch

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, path)
