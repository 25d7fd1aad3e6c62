"""Parity tests for the signal core against the PyTorch reference."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from alivevc_tpu.ops.interp import linear_interpolate
from alivevc_tpu.ops.stft import (
    log_mel_spectrogram,
    mel_spectrogram,
    spectrogram,
    stft_magnitude,
)
from alivevc_tpu.ops.pitch import apply_intonation, shift_pitch
from alivevc_tpu.ops.resample import resample

from ref_loader import load_reference

ref = load_reference()


def rng(seed=0):
    return np.random.default_rng(seed)


# ---------------------------------------------------------------------------
# STFT front end
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("length", [38400, 65536, 7680])
def test_spectrogram_matches_reference(length):
    x = rng(1).standard_normal((2, length)).astype(np.float32)
    want = ref.spectrogram.spectrogram(torch.from_numpy(x)).numpy()  # [N, 641, T]
    got = np.asarray(spectrogram(jnp.asarray(x)))                     # [N, T, 641]
    assert got.shape == (2, length // 320, 641)
    np.testing.assert_allclose(got.transpose(0, 2, 1), want, rtol=2e-4, atol=2e-3)


@pytest.mark.parametrize("n_fft", [512, 1024, 2048])
def test_mrd_stft_matches_torch(n_fft):
    """The MRD discriminator STFT (module/discriminator.py:137): rect window,
    hop=n_fft//4, no frame drop."""
    x = rng(2).standard_normal((2, 9600)).astype(np.float32)
    want = torch.stft(
        torch.from_numpy(x), n_fft, n_fft // 4, return_complex=True
    ).abs().numpy()
    got = np.asarray(stft_magnitude(jnp.asarray(x), n_fft, n_fft // 4))
    np.testing.assert_allclose(got.transpose(0, 2, 1), want, rtol=2e-4, atol=2e-3)


def test_mel_matches_torch_manual():
    """Mel path vs a torch-side manual reimplementation of torchaudio's
    MelSpectrogram (hann window, power=2, HTK fbank, norm=None)."""
    x = rng(3).standard_normal((1, 16000)).astype(np.float32)
    xt = torch.from_numpy(x)
    spec = torch.stft(
        xt, 1280, 320, 1280, window=torch.hann_window(1280), center=True,
        pad_mode="reflect", return_complex=True,
    ).abs() ** 2  # [N, 641, T]

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    all_freqs = np.linspace(0, 8000, 641)
    m_pts = np.linspace(hz_to_mel(0.0), hz_to_mel(8000.0), 82)
    f_pts = mel_to_hz(m_pts)
    f_diff = np.diff(f_pts)
    slopes = f_pts[None, :] - all_freqs[:, None]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0, np.minimum(down, up))  # [641, 80]
    want = np.einsum("nft,fm->nmt", spec.numpy(), fb)

    got = np.asarray(mel_spectrogram(jnp.asarray(x)))
    np.testing.assert_allclose(got.transpose(0, 2, 1), want, rtol=1e-3, atol=1e-3)

    lm = np.asarray(log_mel_spectrogram(jnp.asarray(x)))
    np.testing.assert_allclose(
        lm.transpose(0, 2, 1), np.log(want + 1e-4), rtol=1e-3, atol=1e-3
    )


def test_mel_htk_anchor():
    # HTK scale: mel(1000 Hz) ≈ 999.99
    assert abs(2595.0 * np.log10(1 + 1000 / 700.0) - 999.9855) < 1e-3


# ---------------------------------------------------------------------------
# linear interpolation
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "in_size,out_size", [(120, 38400), (204, 65280), (7, 13), (100, 33), (33, 100), (5, 5)]
)
def test_linear_interpolate_matches_torch(in_size, out_size):
    x = rng(4).standard_normal((2, 3, in_size)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), out_size, mode="linear").numpy()
    got = np.asarray(linear_interpolate(jnp.asarray(x), out_size, axis=-1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_linear_interpolate_channels_last():
    x = rng(5).standard_normal((2, 50, 64)).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(x.transpose(0, 2, 1)), 320, mode="linear"
    ).numpy()
    got = np.asarray(linear_interpolate(jnp.asarray(x), 320, axis=1))
    np.testing.assert_allclose(got.transpose(0, 2, 1), want, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# resampler (torchaudio unavailable: property tests)
# ---------------------------------------------------------------------------


def test_resample_length_and_tone():
    sr_in, sr_out = 16000, 8000
    t = np.arange(32000) / sr_in
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)[None]
    y = np.asarray(resample(jnp.asarray(x), sr_in, sr_out))
    assert y.shape == (1, 16000)
    # mid-band pure tone must survive with the right frequency & amplitude
    t2 = np.arange(y.shape[1]) / sr_out
    target = np.sin(2 * np.pi * 440.0 * t2)
    seg = slice(100, -100)
    c = np.corrcoef(y[0][seg], target[seg])[0, 1]
    assert c > 0.999
    assert abs(np.abs(y[0][seg]).max() - 1.0) < 0.02


@pytest.mark.parametrize("pair", [(24000, 16000), (16000, 24000), (44100, 16000)])
def test_resample_lengths(pair):
    import math

    sr_in, sr_out = pair
    x = rng(6).standard_normal((1, 12345)).astype(np.float32)
    y = np.asarray(resample(jnp.asarray(x), sr_in, sr_out))
    assert y.shape[1] == math.ceil(12345 * sr_out / sr_in)


def test_resample_identity():
    x = rng(7).standard_normal((3, 1000)).astype(np.float32)
    y = np.asarray(resample(jnp.asarray(x), 16000, 16000))
    np.testing.assert_array_equal(x, y)


# ---------------------------------------------------------------------------
# pitch math
# ---------------------------------------------------------------------------


def test_pitch_shift_matches_reference_math():
    f0 = np.array([[0.0, 100.0, 220.0, 440.0, 0.0]], dtype=np.float32)
    f0_t = torch.from_numpy(f0)
    pitch = 12 * torch.log2(f0_t / 440) - 9
    pitch = pitch + 3.0
    want = 440 * 2 ** ((pitch + 9) / 12)
    want[torch.logical_or(want.isnan(), want.isinf())] = 0
    got = np.asarray(shift_pitch(jnp.asarray(f0), 3.0))
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-4)


def test_intonation_matches_reference_math():
    f0 = np.array([[0.0, 100.0, 220.0, 440.0, 0.0, 180.0]], dtype=np.float32)
    f0_t = torch.from_numpy(f0)
    pitch = 12 * torch.log2(f0_t / 440) - 9
    mean_pitch = pitch.masked_select(
        torch.logical_not(torch.logical_or(pitch.isinf(), pitch.isnan()))
    ).mean()
    intonation = pitch - mean_pitch
    pitch2 = mean_pitch + intonation * 1.7 + 2.0
    want = 440 * 2 ** ((pitch2 + 9) / 12)
    want[torch.logical_or(want.isnan(), want.isinf())] = 0
    got = np.asarray(apply_intonation(jnp.asarray(f0), 1.7, 2.0))
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-3)
