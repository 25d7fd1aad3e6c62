"""Deployment export (reference: export_onnx.py): the same six-graph split,
serialized as StableHLO via ``jax.export`` (.stablehlo files with symbolic
batch/length dims where supported, static fallback otherwise).

Graphs: f0_estimator (argmax Hz), content_encoder, voice_library match,
feature_extractor, harmonic_oscillator (upsampled amplitudes only — the sin
bank is left to the deploy runtime, mirroring the reference's ONNX wrapper,
module/decoder.py:226-235), filter.
"""

from __future__ import annotations

import argparse
import functools
import os

import jax
import jax.numpy as jnp

from alivevc_tpu.cli.common import load_params_or_init
from alivevc_tpu.compat.torch_import import (
    import_content_encoder,
    import_decoder,
    import_f0_estimator,
    import_voice_library,
)
from alivevc_tpu.config import DecoderConfig
from alivevc_tpu.models.content_encoder import content_encoder, init_content_encoder
from alivevc_tpu.models.decoder import (
    feature_extractor,
    filter_unet,
    init_decoder,
)
from alivevc_tpu.models.f0_estimator import f0_estimate, init_f0_estimator
from alivevc_tpu.models.voice_library import init_voice_library, voice_library_match
from alivevc_tpu.nn.layers import linear
from alivevc_tpu.ops.interp import linear_interpolate


def build_parser():
    p = argparse.ArgumentParser(description="export StableHLO graphs")
    p.add_argument("-o", "--outputs", default="./export/")
    p.add_argument("-dep", "--decoder-path", default="decoder.ckpt")
    p.add_argument("-cep", "--content-encoder-path", default="content_encoder.ckpt")
    p.add_argument("-f0ep", "--f0-estimator-path", default="f0_estimator.ckpt")
    p.add_argument("-lib", "--voice-library-path", default="voice_library.ckpt")
    p.add_argument("--length", default=256, type=int,
                   help="frame length for static-shape graphs")
    p.add_argument("--torch-out", default=None,
                   help="also export reference-format torch .pt state dicts here")
    return p


def _export_one(path: str, fn, *example_args):
    from jax import export as jexport

    exported = jexport.export(jax.jit(fn))(*example_args)
    with open(path, "wb") as f:
        f.write(exported.serialize())
    print(f"exported {path}")


def main(argv=None):
    from alivevc_tpu.cli.common import apply_platform_env

    apply_platform_env()
    args = build_parser().parse_args(argv)
    os.makedirs(args.outputs, exist_ok=True)
    key = jax.random.PRNGKey(0)
    ce = load_params_or_init(
        args.content_encoder_path, init_content_encoder, import_content_encoder, key
    )
    pe = load_params_or_init(
        args.f0_estimator_path, init_f0_estimator, import_f0_estimator, key
    )
    dec = load_params_or_init(args.decoder_path, init_decoder, import_decoder, key)
    vl = load_params_or_init(
        args.voice_library_path, init_voice_library, import_voice_library, key
    )
    t = args.length
    cfg = DecoderConfig()
    out = args.outputs

    spec = jnp.zeros((1, t, 641), jnp.float32)
    content = jnp.zeros((1, t, 768), jnp.float32)
    f0 = jnp.zeros((1, t, 1), jnp.float32)
    feats = jnp.zeros((1, t, 512), jnp.float32)
    wave = jnp.zeros((1, t * cfg.segment_size, 1), jnp.float32)

    _export_one(os.path.join(out, "f0_estimator.stablehlo"),
                lambda x: f0_estimate(pe, x), spec)
    _export_one(os.path.join(out, "content_encoder.stablehlo"),
                lambda x: content_encoder(ce, x), spec)
    _export_one(os.path.join(out, "voice_library.stablehlo"),
                lambda x: voice_library_match(vl, x), content)
    _export_one(os.path.join(out, "feature_extractor.stablehlo"),
                lambda x, f: feature_extractor(dec["feature_extractor"], x, f),
                content, f0)

    def oscillator_amps(x):
        # reference ONNX wrapper: upsampled amplitudes only
        amps = jnp.exp(linear(dec["harmonic_oscillator"]["to_amps"], x))
        return linear_interpolate(amps, x.shape[1] * cfg.segment_size, axis=1)

    _export_one(os.path.join(out, "harmonic_oscillator.stablehlo"),
                oscillator_amps, feats)
    _export_one(os.path.join(out, "filter.stablehlo"),
                lambda w, c: filter_unet(dec["filter"], w, c, cfg)[..., 0],
                wave, feats)

    if args.torch_out:
        from alivevc_tpu.compat.torch_export import (
            export_content_encoder,
            export_decoder,
            export_f0_estimator,
            export_voice_library,
            save_torch_state_dict,
        )

        os.makedirs(args.torch_out, exist_ok=True)
        for name, sd in (
            ("content_encoder.pt", export_content_encoder(ce)),
            ("f0_estimator.pt", export_f0_estimator(pe)),
            ("decoder.pt", export_decoder(dec)),
            ("voice_library.pt", export_voice_library(vl)),
        ):
            save_torch_state_dict(os.path.join(args.torch_out, name), sd)
            print(f"exported {os.path.join(args.torch_out, name)}")
    print("Export complete!")


if __name__ == "__main__":
    main()
