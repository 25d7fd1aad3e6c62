"""PyTorch-checkpoint importer: reference ``.pt`` state_dicts → parameter pytrees.

This is the interop surface with the reference's artifacts
(content_encoder.pt / f0_estimator.pt / decoder.pt / discriminator.pt /
voice_library.pt — SURVEY §5 "Checkpoint / resume") and the backbone of the
parity test-suite: reference weights are imported and outputs compared
allclose.

All functions take a ``dict[str, np.ndarray]`` (torch tensor names → arrays);
``load_torch_state_dict`` converts a ``.pt`` file if torch is importable.

Layout conversions (torch → ours):
  * Conv1d 1x1  [out, in, 1]      → linear w [in, out]
  * Conv1d kxk  [out, in, k]      → conv w [k, in, out]
  * depthwise   [C, 1, k]         → dw w [k, C]
  * down conv (k=r=stride)        → [r*in, out]   (tap-major rows)
  * ConvTranspose1d (k=r=stride)  → [in, r*out]   (tap-major cols)
  * Conv2d weight-norm v [out, in/g, kh, kw] → [kh, kw, in/g, out]
  * norm scale/shift [1, C, 1]    → [C]
  * library tokens [1, 768, 512]  → [512, 768]
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp

from alivevc_tpu.config import DecoderConfig, DiscriminatorConfig

Array = np.ndarray
StateDict = Dict[str, Array]


def load_torch_state_dict(path: str) -> StateDict:
    """Load a torch ``.pt`` state_dict into numpy (requires torch)."""
    import torch  # local import: torch is host-side tooling only

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _lin(sd: StateDict, prefix: str):
    """1x1 Conv1d → linear."""
    w = sd[f"{prefix}.weight"]
    return {"w": jnp.asarray(w[:, :, 0].T), "b": jnp.asarray(sd[f"{prefix}.bias"])}


def _conv(sd: StateDict, prefix: str):
    """General Conv1d [out, in, k] → [k, in, out]."""
    w = sd[f"{prefix}.weight"]
    return {
        "w": jnp.asarray(np.transpose(w, (2, 1, 0))),
        "b": jnp.asarray(sd[f"{prefix}.bias"]),
    }


def _dw(sd: StateDict, prefix: str):
    """Depthwise Conv1d [C, 1, k] → [k, C]."""
    w = sd[f"{prefix}.weight"]
    return {
        "w": jnp.asarray(np.transpose(w, (2, 1, 0))[:, 0, :]),
        "b": jnp.asarray(sd[f"{prefix}.bias"]),
    }


def _norm(sd: StateDict, prefix: str):
    return {
        "scale": jnp.asarray(sd[f"{prefix}.scale"][0, :, 0]),
        "shift": jnp.asarray(sd[f"{prefix}.shift"][0, :, 0]),
    }


def _chan_scale(sd: StateDict, key: str):
    return jnp.asarray(sd[key][0, :, 0])


def _convnext(sd: StateDict, prefix: str):
    return {
        "dw_conv": _dw(sd, f"{prefix}.dw_conv"),
        "norm": _norm(sd, f"{prefix}.norm"),
        "pw_conv1": _lin(sd, f"{prefix}.pw_conv1"),
        "pw_conv2": _lin(sd, f"{prefix}.pw_conv2"),
        "scale": _chan_scale(sd, f"{prefix}.scale"),
    }


def _adaptive_convnext(sd: StateDict, prefix: str):
    return {
        "dw_conv": _dw(sd, f"{prefix}.dw_conv"),
        "norm": {
            "scale": _lin(sd, f"{prefix}.norm.scale"),
            "shift": _lin(sd, f"{prefix}.norm.shift"),
        },
        "pw_conv1": _lin(sd, f"{prefix}.pw_conv1"),
        "pw_conv2": _lin(sd, f"{prefix}.pw_conv2"),
        "scale": _chan_scale(sd, f"{prefix}.scale"),
    }


def _count_layers(sd: StateDict, fmt: str) -> int:
    n = 0
    while any(k.startswith(fmt.format(n)) for k in sd):
        n += 1
    return n


# ---------------------------------------------------------------------------
# model importers
# ---------------------------------------------------------------------------


def import_content_encoder(sd: StateDict):
    n = _count_layers(sd, "mid_layers.{}.")
    return {
        "input_layer": _lin(sd, "input_layer"),
        "mid_layers": [_convnext(sd, f"mid_layers.{i}") for i in range(n)],
        "output_layer": _lin(sd, "output_layer"),
    }


def import_f0_estimator(sd: StateDict):
    n = _count_layers(sd, "mid_layers.{}.")
    return {
        "input_layer": _lin(sd, "input_layer"),
        "mid_layers": [_convnext(sd, f"mid_layers.{i}") for i in range(n)],
        "last_norm": _norm(sd, "last_norm"),
        "output_layer": _lin(sd, "output_layer"),
    }


def import_voice_library(sd: StateDict):
    return {"tokens": jnp.asarray(sd["tokens"][0].T)}


def _mod_causal(sd: StateDict, prefix: str):
    return {
        "conv": _conv(sd, f"{prefix}.conv.conv"),
        "to_scale": _lin(sd, f"{prefix}.to_scale"),
        "to_shift": _lin(sd, f"{prefix}.to_shift"),
    }


def import_decoder(sd: StateDict, cfg: DecoderConfig = DecoderConfig()):
    fe_n = _count_layers(sd, "feature_extractor.mid_layers.{}.")
    fe = {
        "input_layer": _lin(sd, "feature_extractor.input_layer"),
        "f0_enc": {
            "c1": _lin(sd, "feature_extractor.f0_enc.c1"),
            "c2": _lin(sd, "feature_extractor.f0_enc.c2"),
        },
        "mid_layers": [
            _adaptive_convnext(sd, f"feature_extractor.mid_layers.{i}")
            for i in range(fe_n)
        ],
    }

    osc = {"to_amps": _lin(sd, "harmonic_oscillator.to_amps")}

    downs = []
    for i in range(len(cfg.filter_rates)):
        w = sd[f"filter.downs.{i}.weight"]            # [out, in, r]
        r = w.shape[2]
        w = np.transpose(w, (2, 1, 0)).reshape(r * w.shape[1], w.shape[0])
        downs.append({"w": jnp.asarray(w), "b": jnp.asarray(sd[f"filter.downs.{i}.bias"])})

    ups, blocks = [], []
    for i in range(len(cfg.filter_rates)):
        w = sd[f"filter.ups.{i}.weight"]              # [in, out, r]
        cin, cout, r = w.shape
        w = np.transpose(w, (0, 2, 1)).reshape(cin, r * cout)
        ups.append({"w": jnp.asarray(w), "b": jnp.asarray(sd[f"filter.ups.{i}.bias"])})
        n_res = _count_layers(sd, f"filter.blocks.{i}.blocks.{{}}.".format("{}"))
        blocks.append(
            {
                "input_conv": _lin(sd, f"filter.blocks.{i}.input_conv"),
                "blocks": [
                    {
                        "c1": _mod_causal(sd, f"filter.blocks.{i}.blocks.{d}.c1"),
                        "c2": _mod_causal(sd, f"filter.blocks.{i}.blocks.{d}.c2"),
                    }
                    for d in range(cfg.filter_dilations)
                ],
            }
        )

    filt = {
        "source_in": _conv(sd, "filter.source_in"),
        "downs": downs,
        "mid_conv": _conv(sd, "filter.mid_conv.conv"),
        "ups": ups,
        "blocks": blocks,
        "source_out": _conv(sd, "filter.source_out"),
    }
    return {"feature_extractor": fe, "harmonic_oscillator": osc, "filter": filt}


def _wn_conv2d(sd: StateDict, prefix: str):
    v = sd[f"{prefix}.weight_v"]                      # [out, in/g, kh, kw]
    g = sd[f"{prefix}.weight_g"]                      # [out, 1, 1, 1]
    return {
        "v": jnp.asarray(np.transpose(v, (2, 3, 1, 0))),
        "g": jnp.asarray(g.reshape(-1)),
        "b": jnp.asarray(sd[f"{prefix}.bias"]),
    }


def import_discriminator(
    sd: StateDict, cfg: DiscriminatorConfig = DiscriminatorConfig()
):
    mpd = []
    for i, period in enumerate(cfg.periods):
        pre = f"MPD.sub_discriminators.{i}"
        layer_idx = [
            int(k[len(pre) + 8 :].split(".")[0])
            for k in sd
            if k.startswith(f"{pre}.layers.") and k.endswith(".weight_v")
        ]
        mpd.append(
            {
                "input_layer": _wn_conv2d(sd, f"{pre}.input_layer"),
                "layers": [
                    _wn_conv2d(sd, f"{pre}.layers.{j}") for j in sorted(set(layer_idx))
                ],
                "final_conv": _wn_conv2d(sd, f"{pre}.final_conv"),
                "output_layer": _wn_conv2d(sd, f"{pre}.output_layer"),
            }
        )
    mrd = []
    for i, n_fft in enumerate(cfg.resolutions):
        pre = f"MRD.sub_discriminators.{i}"
        mrd.append(
            {
                "layers": [_wn_conv2d(sd, f"{pre}.layers.{j}") for j in range(5)],
                "conv_post": _wn_conv2d(sd, f"{pre}.conv_post"),
            }
        )
    return {"mpd": mpd, "mrd": mrd}
