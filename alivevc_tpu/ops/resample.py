"""Polyphase windowed-sinc resampler (torchaudio.functional.resample semantics).

The reference resamples with torchaudio's ``sinc_interp_hann`` method at every
audio boundary (module/dataset.py:27, inference.py:91, module/common.py:134,
realtime_inference.py:146).  This is a polyphase FIR: after reducing the rate
pair by their gcd, each of the ``new_freq`` output phases is a windowed-sinc
filter over the input; we express the whole thing as one strided convolution —
i.e. a [T_out_blocks, kernel_width] x [kernel_width, new_freq] matmul, which is
exactly the shape the MXU wants.

Defaults mirror torchaudio: lowpass_filter_width=6, rolloff=0.99, Hann window.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _resample_kernel_np(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
):
    """Build the polyphase filter bank.

    Returns (kernels [new_freq, width_total], width) where width_total =
    2*width + orig_freq and the output phase p at block t reads input samples
    [t*orig_freq - width, t*orig_freq + width + orig_freq).
    """
    base_freq = min(orig_freq, new_freq) * rolloff
    width = int(math.ceil(lowpass_filter_width * orig_freq / base_freq))
    idx = np.arange(-width, width + orig_freq, dtype=np.float64) / orig_freq
    t = np.arange(0, -new_freq, -1, dtype=np.float64)[:, None] / new_freq + idx[None, :]
    t = t * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * math.pi / lowpass_filter_width / 2.0) ** 2
    tpi = t * math.pi
    kernels = np.where(tpi == 0.0, 1.0, np.sin(tpi) / np.where(tpi == 0.0, 1.0, tpi))
    kernels = kernels * window * (base_freq / orig_freq)
    return kernels.astype(np.float32), width


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def resample(
    x: jax.Array,
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> jax.Array:
    """Resample ``x`` [..., L] from ``orig_freq`` to ``new_freq`` Hz.

    Output length = ceil(new_freq * L / orig_freq), matching torchaudio.
    """
    if orig_freq == new_freq:
        return x
    g = math.gcd(int(orig_freq), int(new_freq))
    of, nf = orig_freq // g, new_freq // g

    kernels, width = _resample_kernel_np(of, nf, lowpass_filter_width, rolloff)
    k = jnp.asarray(kernels)  # [nf, 2*width + of]
    kw = kernels.shape[1]

    batch_shape = x.shape[:-1]
    length = x.shape[-1]
    xf = x.reshape(-1, length).astype(jnp.float32)

    target_length = int(math.ceil(nf * length / of))
    num_blocks = (target_length + nf - 1) // nf

    # pad so every block has a full filter support
    pad_left = width
    pad_right = width + of + max(0, (num_blocks - 1) * of + kw - (length + 2 * width + of))
    xp = jnp.pad(xf, ((0, 0), (pad_left, pad_right)))

    starts = jnp.arange(num_blocks) * of
    idx = starts[:, None] + jnp.arange(kw)[None, :]
    blocks = xp[:, idx]                       # [B, num_blocks, kw]
    out = blocks @ k.T                        # [B, num_blocks, nf]
    out = out.reshape(xf.shape[0], num_blocks * nf)[:, :target_length]
    return out.reshape(*batch_shape, target_length).astype(x.dtype)
