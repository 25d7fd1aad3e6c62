"""Pitch ↔ F0 math used by the conversion pipelines.

Reproduces the pitch-shift / intonation-scaling block of the offline CLI
(inference.py:119-126) and the simpler streaming variant
(realtime_inference.py:157-163).  All NaN/Inf values produced by log2(0) on
unvoiced frames are scrubbed to 0 Hz exactly as the reference does.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def f0_to_pitch(f0: jax.Array) -> jax.Array:
    """Hz → semitone pitch: 12*log2(f0/440) - 9 (inference.py:119)."""
    return 12.0 * jnp.log2(f0 / 440.0) - 9.0


def pitch_to_f0(pitch: jax.Array) -> jax.Array:
    """Semitone pitch → Hz: 440 * 2**((p+9)/12) (inference.py:125)."""
    return 440.0 * 2.0 ** ((pitch + 9.0) / 12.0)


def shift_pitch(f0: jax.Array, semitones: float) -> jax.Array:
    """Streaming-path pitch shift (realtime_inference.py:157-163):
    pitch += shift, back to Hz, NaN/Inf→0."""
    pitch = f0_to_pitch(f0) + semitones
    out = pitch_to_f0(pitch)
    return jnp.where(jnp.isfinite(out), out, 0.0)


def apply_intonation(
    f0: jax.Array, intonation: float = 1.0, pitch_shift: float = 0.0
) -> jax.Array:
    """Offline-path intonation scaling about the voiced-mean pitch plus shift
    (inference.py:119-126).  f0: [...], returns Hz with NaN/Inf→0.

    mean_pitch is taken over *finite* pitch values only (unvoiced frames give
    -inf after log2), mirroring the reference's masked_select mean.
    """
    pitch = f0_to_pitch(f0)
    finite = jnp.isfinite(pitch)
    n = jnp.maximum(jnp.sum(finite), 1)
    mean_pitch = jnp.sum(jnp.where(finite, pitch, 0.0)) / n
    pitch = mean_pitch + (pitch - mean_pitch) * intonation + pitch_shift
    out = pitch_to_f0(pitch)
    return jnp.where(jnp.isfinite(out), out, 0.0)
