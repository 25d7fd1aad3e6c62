"""Streaming VC CLI (reference: realtime_inference.py).

Two modes:

  * ``--input-wav/--output-wav`` — file-driven streaming: the wav is pushed
    through the stateful 60 ms-hop pipeline chunk by chunk, exactly as the mic
    path would be (this is the testable path in a headless image);
  * live mic/speaker via PyAudio when available (same flags as the reference:
    -i/-o device indices, -b buffersize, -c chunk...).
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from alivevc_tpu.cli.common import load_params_or_init, log_logo
from alivevc_tpu.compat.torch_import import (
    import_content_encoder,
    import_decoder,
    import_f0_estimator,
    import_voice_library,
)
from alivevc_tpu.config import StreamingConfig
from alivevc_tpu.infer.offline import build_target_matrix
from alivevc_tpu.infer.streaming import StreamingConverter
from alivevc_tpu.io.audio import read_wav, write_wav
from alivevc_tpu.models.content_encoder import init_content_encoder
from alivevc_tpu.models.decoder import init_decoder
from alivevc_tpu.models.f0_estimator import init_f0_estimator
from alivevc_tpu.models.voice_library import init_voice_library
from alivevc_tpu.ops.resample import resample


def build_parser():
    p = argparse.ArgumentParser(description="streaming voice conversion")
    p.add_argument("--input-wav", default=None, help="file-driven streaming input")
    p.add_argument("--output-wav", default=None)
    p.add_argument("-i", "--input", default=0, type=int)
    p.add_argument("-o", "--output", default=0, type=int)
    p.add_argument("-l", "--loopback", default=-1, type=int,
                   help="optional second output device index (-1 = off)")
    p.add_argument("-g", "--gain", default=0.0, type=float)
    p.add_argument("-ig", "--input-gain", default=0.0, type=float)
    p.add_argument("-ic", "--inputchannels", default=1, type=int)
    p.add_argument("-oc", "--outputchannels", default=1, type=int)
    p.add_argument("-lc", "--loopbackchannels", default=1, type=int)
    p.add_argument("-isr", "--input-sr", default=16000, type=int)
    p.add_argument("-osr", "--output-sr", default=16000, type=int)
    p.add_argument("-lsr", "--loopback-sr", default=16000, type=int)
    p.add_argument("-dep", "--decoder-path", default="decoder.ckpt")
    p.add_argument("-cep", "--content-encoder-path", default="content_encoder.ckpt")
    p.add_argument("-f0ep", "--f0-estimator-path", default="f0_estimator.ckpt")
    p.add_argument("-b", "--buffersize", default=8, type=int)
    p.add_argument("-c", "--chunk", default=960, type=int)
    p.add_argument("-f0", "--f0-rate", default=1.0, type=float)
    p.add_argument("-p", "--pitch", default=0.0, type=float)
    p.add_argument("-t", "--target", default="NONE")
    p.add_argument("-k", default=4, type=int)
    p.add_argument("-a", "--alpha", default=0.0, type=float)
    p.add_argument("-lib", "--voice-library-path", default="NONE")
    p.add_argument("-wpe", "--world-pitch-estimation", action="store_true")
    p.add_argument("-pd", "--pipeline-depth", default=1, type=int,
                   help="overlap device round-trips with real time: each hop "
                        "returns the previous hop's output (+1 hop latency, "
                        "~RTT less host cost per hop); 0 = synchronous "
                        "reference loop")
    return p


def _build(args):
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

    cfg = StreamingConfig(
        chunk=args.chunk,
        buffer_size=args.buffersize,
        f0_rate=args.f0_rate,
        pitch_shift=args.pitch,
        k=args.k,
        alpha=args.alpha,
    )
    # realtime path decimates the target utterance frames ×4
    # (realtime_inference.py:88)
    tgt = build_target_matrix(
        ce, target_wave=target_wave, library_tokens=tokens,
        decimation=cfg.target_decimation,
    )
    print(f"Loaded {tgt.shape[0]} words.")
    return StreamingConverter(
        ce, pe, dec, tgt, cfg, world_pitch=args.world_pitch_estimation,
        pipeline_depth=args.pipeline_depth,
    )


def run_file_mode(args):
    conv = _build(args)
    wave, sr = read_wav(args.input_wav)
    if sr != 16000:
        import jax.numpy as jnp

        wave = np.asarray(resample(jnp.asarray(wave), sr, 16000))
    wave = wave[0] * (10.0 ** (args.input_gain / 20.0))
    c = args.chunk
    n = wave.shape[0] // c
    outs = []
    for i in range(n):
        outs.append(conv.process_chunk(wave[i * c : (i + 1) * c]))
    # pipelined mode returns chunks one hop late: drop the leading silence
    # and drain the in-flight tail so file output stays hop-aligned
    outs = outs[conv.pipeline_depth :] + conv.flush()
    out = np.concatenate(outs) * (10.0 ** (args.gain / 20.0))
    write_wav(args.output_wav or "streamed.wav", out, 16000)
    print(f"streamed {n} chunks → {args.output_wav or 'streamed.wav'}")


def run_live_mode(args):
    try:
        import pyaudio
    except ImportError:
        raise SystemExit(
            "PyAudio is not installed in this image; use --input-wav/--output-wav "
            "for file-driven streaming."
        )
    import jax.numpy as jnp

    # device reads happen at input_sr; the pipeline hop is in the 16 kHz domain
    read_chunk = args.chunk
    args.chunk = int(round(args.chunk * 16000 / args.input_sr))
    conv = _build(args)
    audio = pyaudio.PyAudio()
    stream_in = audio.open(
        format=pyaudio.paInt16, rate=args.input_sr, channels=args.inputchannels,
        input_device_index=args.input, input=True,
    )
    stream_out = audio.open(
        format=pyaudio.paInt16, rate=args.output_sr, channels=args.outputchannels,
        output_device_index=args.output, output=True,
    )
    # optional loopback output (reference: realtime_inference.py:40-46,114-116)
    stream_loop = (
        audio.open(
            format=pyaudio.paInt16, rate=args.loopback_sr,
            channels=args.loopbackchannels,
            output_device_index=args.loopback, output=True,
        )
        if args.loopback != -1
        else None
    )
    in_gain = 10.0 ** (args.input_gain / 20.0)
    out_gain = 10.0 ** (args.gain / 20.0)
    print("converting voice...")
    while True:
        data = np.frombuffer(stream_in.read(read_chunk), np.int16)
        x = data.astype(np.float32) / 32768.0
        if args.input_sr != 16000:
            x = np.asarray(resample(jnp.asarray(x[None]), args.input_sr, 16000))[0]
        out = conv.process_chunk(x * in_gain) * out_gain
        if args.output_sr != 16000:
            out = np.asarray(resample(jnp.asarray(out[None]), 16000, args.output_sr))[0]
        payload = (np.clip(out, -1, 1) * 32767).astype(np.int16).tobytes()
        stream_out.write(payload)
        if stream_loop is not None:
            stream_loop.write(payload)


def main(argv=None):
    from alivevc_tpu.cli.common import apply_platform_env

    apply_platform_env()
    log_logo()
    args = build_parser().parse_args(argv)
    if args.input_wav:
        run_file_mode(args)
    else:
        run_live_mode(args)


if __name__ == "__main__":
    main()
