"""Trained-weights cross-runtime oracle.

The strongest parity statement available in this image: weights TRAINED by
this framework, exported with compat/torch_export, are loaded by the actual
reference CLI (/root/reference/inference.py, run as a torch-CPU subprocess
with a functional torchaudio shim) and must convert a fixed utterance to the
same waveform as our own offline pipeline — no weight surgery, no in-test
re-implementation of the reference loop.

Training: a short distillation run for the ContentEncoder (frozen random
teacher of the same architecture), a short CE run for the F0Estimator on
synthetic tones with exact Hz labels, and a short full-size GAN run for the
decoder — enough steps that every exported tensor differs from init.

Reference entry: inference.py:45-155.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from alivevc_tpu.compat.torch_export import (
    export_content_encoder,
    export_decoder,
    export_f0_estimator,
    save_torch_state_dict,
)
from alivevc_tpu.config import InferenceConfig
from alivevc_tpu.infer.offline import OfflineConverter, build_target_matrix
from alivevc_tpu.models.content_encoder import content_encoder, init_content_encoder
from alivevc_tpu.ops.stft import log_mel_spectrogram, spectrogram
from alivevc_tpu.train.distill import distill_step, init_distill
from alivevc_tpu.train.f0 import f0_train_step, init_f0_train
from alivevc_tpu.train.gan import gan_train_step, init_gan

REFERENCE = "/root/reference"
SHIMS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "shims")


def _sine_corpus(rng, n, length, sr=16_000):
    """Synthetic voiced corpus: harmonics at a known F0 + noise floor."""
    t = np.arange(length) / sr
    waves, f0s = [], []
    for _ in range(n):
        f0 = rng.uniform(120.0, 260.0)
        w = sum(
            (0.5 / (h * h)) * np.sin(2 * np.pi * f0 * h * t + rng.uniform(0, 6.28))
            for h in range(1, 6)
        )
        w = w + 0.01 * rng.standard_normal(length)
        waves.append((0.7 * w / np.abs(w).max()).astype(np.float32))
        f0s.append(f0)
    return np.stack(waves), np.asarray(f0s, np.float32)


def _train_models(seed=0, length=7_680, batch=4):
    rng = np.random.default_rng(seed)
    keys = jax.random.split(jax.random.PRNGKey(seed), 8)
    frames = length // 320

    # --- ContentEncoder: distill toward a frozen random teacher ----------
    teacher = init_content_encoder(keys[0])
    state_ce = init_distill(keys[1])
    for i in range(60):
        waves, _ = _sine_corpus(rng, batch, length)
        w = jnp.asarray(waves)
        tfeat = content_encoder(teacher, spectrogram(w))
        state_ce, m = distill_step(state_ce, w, tfeat)
    assert np.isfinite(float(m["loss"]))

    # --- F0Estimator: CE on exact synthetic labels -----------------------
    state_f0 = init_f0_train(keys[2])
    for i in range(120):
        waves, f0s = _sine_corpus(rng, batch, length)
        labels = jnp.broadcast_to(
            jnp.asarray(np.floor(f0s))[:, None], (batch, frames)
        ).astype(jnp.int32)
        state_f0, m = f0_train_step(
            state_f0, jnp.asarray(waves), labels, jax.random.PRNGKey(1000 + i)
        )
    assert np.isfinite(float(m["loss"]))

    # --- Decoder: short full-size GAN run --------------------------------
    state_gan = init_gan(keys[3])
    for i in range(12):
        waves, _ = _sine_corpus(rng, 2, length)
        state_gan, m = gan_train_step(
            state_gan,
            state_ce.params,
            state_f0.params,
            jnp.asarray(waves),
            jax.random.PRNGKey(2000 + i),
        )
    assert np.isfinite(float(m["loss_g"]))

    return state_ce.params, state_f0.params, state_gan.dec_params


@pytest.mark.slow
def test_trained_weights_cross_runtime_oracle(tmp_path):
    ce, pe, dec = _train_models()

    # export .pt state dicts the reference can load
    save_torch_state_dict(str(tmp_path / "content_encoder.pt"), export_content_encoder(ce))
    save_torch_state_dict(str(tmp_path / "f0_estimator.pt"), export_f0_estimator(pe))
    save_torch_state_dict(str(tmp_path / "decoder.pt"), export_decoder(dec))

    # fixed utterance + target speaker clip, both 16 kHz float32 WAVs
    sr = 16_000
    rng = np.random.default_rng(7)
    t = np.arange(sr) / sr
    wave = (
        0.5 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 440 * t + 0.7)
        + 0.02 * rng.standard_normal(t.shape)
    ).astype(np.float32)
    target = (0.5 * np.sin(2 * np.pi * 180 * np.arange(8000) / sr)).astype(np.float32)

    from scipy.io import wavfile

    in_dir, out_dir = tmp_path / "inputs", tmp_path / "outputs"
    in_dir.mkdir()
    wavfile.write(str(in_dir / "utt.wav"), sr, wave)
    wavfile.write(str(tmp_path / "target.wav"), sr, target)

    # --- reference subprocess (torch CPU + torchaudio/pyworld shims) -----
    chunk = 4_800
    env = dict(os.environ)
    env["PYTHONPATH"] = SHIMS + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("MPLBACKEND", "Agg")
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REFERENCE, "inference.py"),
            "-i", str(in_dir), "-o", str(out_dir),
            "-dep", str(tmp_path / "decoder.pt"),
            "-cep", str(tmp_path / "content_encoder.pt"),
            "-f0ep", str(tmp_path / "f0_estimator.pt"),
            "-t", str(tmp_path / "target.wav"),
            "-c", str(chunk), "-g", "0", "-d", "cpu",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, f"reference CLI failed:\n{proc.stdout}\n{proc.stderr}"
    got_sr, want = wavfile.read(str(out_dir / "0_utt.wav"))
    assert got_sr == sr
    want = np.asarray(want, np.float32)

    # --- our pipeline on the same trained params --------------------------
    tgt = build_target_matrix(ce, target_wave=target / np.abs(target).max())
    conv = OfflineConverter(ce, pe, dec, tgt, InferenceConfig(chunk=chunk))
    got = conv.convert_16k(wave)

    assert got.shape == want.shape
    diff = np.abs(got - want)
    rms = float(np.sqrt(np.mean(want ** 2)))
    assert np.quantile(diff, 0.99) < 0.05 * rms, (
        f"p99 {np.quantile(diff, 0.99)} vs rms {rms}"
    )
    assert diff.mean() < 0.01 * rms, f"mean {diff.mean()} vs rms {rms}"
    mel_w = np.asarray(log_mel_spectrogram(jnp.asarray(want)[None]))
    mel_g = np.asarray(log_mel_spectrogram(jnp.asarray(got)[None]))
    mel_diff = np.abs(mel_g - mel_w)
    assert mel_diff.mean() < 1e-2, f"mel mean {mel_diff.mean()}"
    assert np.quantile(mel_diff, 0.99) < 0.1, f"mel p99 {np.quantile(mel_diff, 0.99)}"
