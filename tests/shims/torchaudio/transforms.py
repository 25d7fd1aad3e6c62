"""torchaudio.transforms shim: MelSpectrogram, used by the reference CLI only
to render PNG spectrograms (no assertion rides on it)."""

from __future__ import annotations

import numpy as np
import torch


def _mel_filterbank(sr: int, n_fft: int, n_mels: int) -> torch.Tensor:
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    n_bins = n_fft // 2 + 1
    freqs = np.linspace(0, sr / 2, n_bins)
    mels = np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2), n_mels + 2)
    pts = mel_to_hz(mels)
    fb = np.zeros((n_mels, n_bins), np.float32)
    for m in range(n_mels):
        lo, ctr, hi = pts[m], pts[m + 1], pts[m + 2]
        up = (freqs - lo) / max(ctr - lo, 1e-9)
        dn = (hi - freqs) / max(hi - ctr, 1e-9)
        fb[m] = np.maximum(0.0, np.minimum(up, dn))
    return torch.from_numpy(fb)


class MelSpectrogram(torch.nn.Module):
    def __init__(
        self,
        sample_rate: int = 16000,
        n_fft: int = 400,
        hop_length: int = 200,
        n_mels: int = 128,
        **_,
    ):
        super().__init__()
        self.n_fft, self.hop = n_fft, hop_length
        self.register_buffer("fb", _mel_filterbank(sample_rate, n_fft, n_mels))
        self.register_buffer("window", torch.hann_window(n_fft))

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        spec = torch.stft(
            x, self.n_fft, self.hop, self.n_fft, self.window,
            center=True, return_complex=True,
        ).abs() ** 2
        return self.fb @ spec
