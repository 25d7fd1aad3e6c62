"""Pallas TPU kernel: fused framing + windowed DFT magnitude (STFT front end).

Frames overlap 4:1 (n_fft=1280, hop=320), which maps poorly onto TPU tiled
memory (hop is not lane-aligned: 320 = 2.5 x 128).  The trick: frames with
index j ≡ i (mod 4) are *non-overlapping, contiguous* 1280-sample blocks of
the signal shifted by i*hop — and 1280 = 10 x 128 is perfectly lane-aligned.
So the host materializes four shifted views (a few hundred KB per audio
second), the kernel runs each [T_t, 1280] x [1280, 641] DFT magnitude on the
MXU (window folded into the basis, re/im/mag fused in VMEM), and a final
cheap reshape interleaves the four phases back into frame order.

Matches torch.stft semantics via host-side reflect padding + the
drop-last-frame contract of the reference front end (module/spectrogram.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alivevc_tpu.ops.stft import _dft_basis_np


def _stft_kernel(v0, v1, v2, v3, cos_ref, sin_ref, out_ref, *, ftq: int):
    cos_b = cos_ref[:]
    sin_b = sin_ref[:]
    for i, v in enumerate((v0, v1, v2, v3)):
        frames = v[0]                                    # [ftq, n_fft]
        re = jnp.dot(frames, cos_b, preferred_element_type=jnp.float32)
        im = jnp.dot(frames, sin_b, preferred_element_type=jnp.float32)
        out_ref[0, i * ftq : (i + 1) * ftq, :] = jnp.sqrt(re * re + im * im)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "window", "frame_tile"))
def stft_magnitude_pallas(
    x: jax.Array,
    n_fft: int = 1280,
    hop_length: int = 320,
    window: str = "rect",
    frame_tile: int = 32,
) -> jax.Array:
    """x [N, L] → magnitudes [N, T, n_bins] with T = 1 + L // hop
    (torch.stft center=True count).  Requires n_fft == 4 * hop."""
    assert n_fft == 4 * hop_length, "kernel assumes the 4:1 overlap of the front end"
    n, length = x.shape
    num_frames = length // hop_length + 1
    n_bins = n_fft // 2 + 1

    ft = frame_tile
    assert ft % 4 == 0 and (ft // 4) % 8 == 0, "frame_tile must be a multiple of 32"
    ftq = ft // 4
    n_tiles = -(-num_frames // ft)

    pad = n_fft // 2
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (pad, pad)), mode="reflect")
    needed = (n_tiles * ft - 1) * hop_length + n_fft
    xp = jnp.pad(xp, ((0, 0), (0, max(0, needed - xp.shape[1]))))

    views = []
    blocks = n_tiles * ftq
    for i in range(4):
        vi = jax.lax.dynamic_slice_in_dim(xp, i * hop_length, blocks * n_fft, axis=1)
        views.append(vi.reshape(n, blocks, n_fft))

    cos_b, sin_b = _dft_basis_np(n_fft, window, n_fft)

    view_spec = pl.BlockSpec(
        (1, ftq, n_fft), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
    )
    basis_spec = pl.BlockSpec(
        (n_fft, n_bins), lambda b, t: (0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_stft_kernel, ftq=ftq),
        grid=(n, n_tiles),
        in_specs=[view_spec] * 4 + [basis_spec] * 2,
        out_specs=pl.BlockSpec(
            (1, ft, n_bins), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, n_tiles * ft, n_bins), jnp.float32),
    )(*views, jnp.asarray(cos_b), jnp.asarray(sin_b))

    # kernel writes view-major [4, ftq] rows per tile → interleave to frame order
    out = out.reshape(n, n_tiles, 4, ftq, n_bins)
    out = jnp.transpose(out, (0, 1, 3, 2, 4)).reshape(n, n_tiles * ft, n_bins)
    return out[:, :num_frames, :]
