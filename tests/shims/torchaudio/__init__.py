"""Minimal functional torchaudio shim for running the PyTorch reference
(/root/reference) as a *subprocess* oracle in this image (torchaudio is not
installed).  Implements exactly the surface inference.py touches:

  torchaudio.load / torchaudio.save           (WAV via scipy, float32)
  torchaudio.functional.resample / gain
  torchaudio.transforms.MelSpectrogram       (PNG plots only)

The shim sits on PYTHONPATH only for the oracle subprocess
(tests/test_cross_runtime_oracle.py); it is not part of the library.
"""

from __future__ import annotations

import numpy as np
import torch
from scipy.io import wavfile

from . import functional  # noqa: F401
from . import transforms  # noqa: F401


def load(path: str):
    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim == 1:
        data = data[None, :]
    else:
        data = data.T
    return torch.from_numpy(data.copy()), int(sr)


def save(path: str, src: torch.Tensor, sample_rate: int):
    data = src.detach().cpu().numpy()
    if data.ndim == 2:
        data = data.T
    if data.shape[-1] == 1 if data.ndim == 2 else False:
        data = data[:, 0]
    wavfile.write(path, int(sample_rate), np.squeeze(data).astype(np.float32))
