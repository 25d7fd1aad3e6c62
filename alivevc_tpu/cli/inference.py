"""Offline batch VC CLI (reference: inference.py).

    python -m alivevc_tpu.cli.inference -i inputs/ -o outputs/ -t target.wav \
        -lib voice_library.ckpt -p 2 -int 1.2

Flags mirror the reference (inference.py:20-43); checkpoints may be torch
``.pt`` (imported) or our ``.npz``.
"""

from __future__ import annotations

import argparse
import glob
import os

import jax
import numpy as np

from alivevc_tpu.cli.common import load_params_or_init
from alivevc_tpu.compat.torch_import import (
    import_content_encoder,
    import_decoder,
    import_f0_estimator,
    import_voice_library,
)
from alivevc_tpu.config import InferenceConfig
from alivevc_tpu.infer.offline import OfflineConverter, build_target_matrix
from alivevc_tpu.io.audio import read_wav, write_wav
from alivevc_tpu.models.content_encoder import init_content_encoder
from alivevc_tpu.models.decoder import init_decoder
from alivevc_tpu.models.f0_estimator import init_f0_estimator
from alivevc_tpu.models.voice_library import init_voice_library
from alivevc_tpu.ops.resample import resample


def build_parser():
    p = argparse.ArgumentParser(description="offline voice conversion")
    p.add_argument("-i", "--inputs", default="./inputs/")
    p.add_argument("-o", "--outputs", default="./outputs/")
    p.add_argument("-dep", "--decoder-path", default="decoder.ckpt")
    p.add_argument("-cep", "--content-encoder-path", default="content_encoder.ckpt")
    p.add_argument("-f0ep", "--f0-estimator-path", default="f0_estimator.ckpt")
    p.add_argument("-f0", "--f0-rate", default=1.0, type=float)
    p.add_argument("-p", "--pitch", default=0.0, type=float)
    p.add_argument("-int", "--intonation", default=1.0, type=float)
    p.add_argument("-t", "--target", default="NONE")
    p.add_argument("-g", "--gain", default=0.0, type=float)
    p.add_argument("-a", "--alpha", default=0.0, type=float)
    p.add_argument("-k", default=4, type=int)
    p.add_argument("-c", "--chunk", default=48000, type=int)
    p.add_argument("-lib", "--voice-library-path", default="NONE")
    p.add_argument("-norm", "--normalize", action="store_true")
    p.add_argument("-wpe", "--world-pitch-estimation", action="store_true",
                   help="use the WORLD (DIO+StoneMask) pitch instead of the learned estimator")
    p.add_argument("--save-spectrograms", action="store_true",
                   help="dump input/output log-mel PNGs next to each converted file")
    p.add_argument("--impl", default="xla", choices=["xla", "pallas"],
                   help="compute path: XLA or the hand-written Pallas TPU kernels")
    p.add_argument("-bf16", action="store_true",
                   help="bfloat16 activations (the reference's -fp16 analogue; "
                        "~1.25x faster, ~3%% waveform deviation)")
    return p


def main(argv=None):
    from alivevc_tpu.cli.common import apply_platform_env

    apply_platform_env()
    args = build_parser().parse_args(argv)
    key = jax.random.PRNGKey(0)
    ce = load_params_or_init(
        args.content_encoder_path, init_content_encoder, import_content_encoder, key
    )
    pe = load_params_or_init(
        args.f0_estimator_path, init_f0_estimator, import_f0_estimator, key
    )
    dec = load_params_or_init(args.decoder_path, init_decoder, import_decoder, key)

    target_wave = None
    if args.target != "NONE":
        w, sr = read_wav(args.target)
        w = w[:1]
        if sr != 16000:
            import jax.numpy as jnp

            w = np.asarray(resample(jnp.asarray(w), sr, 16000))
        peak = np.abs(w).max()
        if peak > 0:
            w = w / peak
        target_wave = w[0]

    tokens = None
    if args.voice_library_path != "NONE":
        vl = load_params_or_init(
            args.voice_library_path, init_voice_library, import_voice_library, key
        )
        tokens = vl["tokens"]

    tgt = build_target_matrix(ce, target_wave=target_wave, library_tokens=tokens)
    print(f"Loaded {tgt.shape[0]} words.")

    cfg = InferenceConfig(
        chunk=args.chunk,
        f0_rate=args.f0_rate,
        pitch_shift=args.pitch,
        intonation=args.intonation,
        k=args.k,
        alpha=args.alpha,
        gain_db=args.gain,
        normalize=args.normalize,
    )
    conv = OfflineConverter(
        ce, pe, dec, tgt, cfg,
        impl=args.impl, world_pitch=args.world_pitch_estimation,
        dtype="bf16" if args.bf16 else "fp32",
    )

    os.makedirs(args.outputs, exist_ok=True)
    paths = sorted(glob.glob(os.path.join(args.inputs, "*")))
    for i, path in enumerate(paths):
        wave, sr = read_wav(path)
        print(f"converting {path}")
        out = conv.convert(wave, sr)
        stem = f"{i}_{os.path.splitext(os.path.basename(path))[0]}"
        write_wav(os.path.join(args.outputs, stem + ".wav"), out, sr)
        if args.save_spectrograms:
            # input/output log-mel PNGs (inference.py:154-155)
            import jax.numpy as jnp

            from alivevc_tpu.ops.stft import log_mel_spectrogram
            from alivevc_tpu.utils.plotting import plot_spectrogram

            mono_in = wave.mean(axis=0) if wave.ndim == 2 else wave
            for tag, w in (("input", mono_in), ("output", out)):
                mel = log_mel_spectrogram(jnp.asarray(w, jnp.float32)[None], sr)
                plot_spectrogram(
                    __import__("numpy").asarray(mel)[0],
                    os.path.join(args.outputs, f"{stem}_{tag}_spec.png"),
                    log=False,
                )
    print("Complete!")


if __name__ == "__main__":
    main()
