"""torchaudio.functional shim: resample (windowed-sinc polyphase) and
gain (dB).  The oracle test feeds 16 kHz WAVs so resample is identity there;
the generic path exists for robustness, not bit-parity with torchaudio."""

from __future__ import annotations

import math

import torch


def resample(
    waveform: torch.Tensor,
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> torch.Tensor:
    orig_freq, new_freq = int(orig_freq), int(new_freq)
    if orig_freq == new_freq:
        return waveform
    gcd = math.gcd(orig_freq, new_freq)
    up, down = new_freq // gcd, orig_freq // gcd
    cutoff = min(orig_freq, new_freq) * rolloff / 2.0
    half_width = int(math.ceil(lowpass_filter_width * orig_freq / (2 * cutoff)))
    idx = torch.arange(-half_width, half_width + 1, dtype=torch.float64)
    kernels = []
    for phase in range(up):
        # tap positions in input-sample units for output phase `phase`
        t = idx - phase * down / up
        x = 2.0 * cutoff / orig_freq * t
        sinc = torch.where(
            x == 0, torch.ones_like(x), torch.sin(math.pi * x) / (math.pi * x)
        )
        window = torch.cos(math.pi * t / (2 * half_width + 1)).clamp(-1, 1) ** 2
        kernels.append(sinc * window * (2.0 * cutoff / orig_freq))
    kernel = torch.stack(kernels).to(torch.float32)  # [up, taps]

    c, length = waveform.shape[0], waveform.shape[-1]
    x = waveform.reshape(-1, 1, length)
    x = torch.nn.functional.pad(x, (half_width, half_width + down))
    out = torch.nn.functional.conv1d(x, kernel[:, None, :], stride=down)
    out = out.transpose(1, 2).reshape(c, -1)
    new_len = int(math.ceil(new_freq * length / orig_freq))
    return out[:, :new_len]


def gain(waveform: torch.Tensor, gain_db: float = 1.0) -> torch.Tensor:
    return waveform * (10.0 ** (gain_db / 20.0))
