"""Offline chunked voice conversion — the parity target pipeline.

Reproduces inference.py:87-134: the input is peak-normalized, padded by one
chunk on each side, cut into overlapping 3-chunk windows with 1-chunk stride
(overlap-discard), each window converted independently, and the center chunk
kept.  The per-window conversion is a single jitted program:

    wave → STFT → [F0 estimate → pitch/intonation math] ∥ [ContentEncoder →
    kNN match vs target matrix] → DDSP decoder → wave

All windows are processed as one batched tensor [num_windows, 3*chunk] — on
TPU the overlap-discard scheme *is* the data-parallel axis, so a whole
utterance becomes one MXU-dense batch instead of the reference's sequential
python loop.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from alivevc_tpu.config import DecoderConfig, InferenceConfig
from alivevc_tpu.models.content_encoder import content_encoder
from alivevc_tpu.models.decoder import decoder
from alivevc_tpu.models.f0_estimator import f0_estimate
from alivevc_tpu.ops.knn import match_features
from alivevc_tpu.ops.pitch import apply_intonation
from alivevc_tpu.ops.resample import resample
from alivevc_tpu.ops.stft import spectrogram


@functools.partial(
    jax.jit, static_argnames=("k", "dec_cfg", "impl", "dtype", "knn_precision")
)
def convert_window(
    ce_params,
    f0_params,
    dec_params,
    window: jax.Array,      # [N, Lw] windows at 16 kHz
    tgt: jax.Array,          # [Lr, 768] target matrix (encoder frames + library)
    f0_rate: float = 1.0,
    pitch_shift: float = 0.0,
    intonation: float = 1.0,
    k: int = 4,
    alpha: float = 0.0,
    dec_cfg: DecoderConfig = DecoderConfig(),
    impl: str = "xla",
    f0_override=None,        # [N, T, 1] Hz — WORLD pitch (-wpe), bypasses the estimator
    dtype: str = "fp32",     # 'bf16' halves HBM traffic of the conv/elementwise path
    knn_precision: Optional[str] = None,   # None → 'default' (bf16) / 'high' (fp32)
) -> jax.Array:
    """Convert a batch of 16 kHz windows; returns [N, Lw] converted audio.

    impl='pallas' routes the STFT front end, the library top-k, and the
    oscillator source through the hand-written TPU kernels (kernels/).

    knn_precision picks the Pallas kNN matmul mode (kernels/knn_pallas.py):
    the fp32 path defaults to 'high' (bf16x3 operand widening — scores
    f32-faithful to ~1e-7, 3 MXU passes, ~2x faster than the 6-pass
    'highest' emulation); pass 'highest' explicitly for bit-exact fp32
    ranking (the strict parity contract of module/common.py:96-109).
    """
    if dtype == "bf16":
        ce_params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            ce_params,
        )
        dec_params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            dec_params,
        )
        window = window.astype(jnp.bfloat16)
    if impl == "pallas":
        from alivevc_tpu.kernels.stft_pallas import stft_magnitude_pallas

        spec = stft_magnitude_pallas(window)[:, :-1, :].astype(window.dtype)
    else:
        spec = spectrogram(window)
    if f0_override is not None:
        f0 = f0_override
    else:
        f0 = f0_estimate(f0_params, spec.astype(jnp.float32))  # [N, T, 1]
    # per-window intonation scaling about the voiced mean (inference.py:119-126)
    f0 = jax.vmap(lambda f: apply_intonation(f, intonation, pitch_shift))(f0)
    feat = content_encoder(ce_params, spec)
    if impl == "pallas":
        from alivevc_tpu.kernels.knn_pallas import match_features_pallas_batched

        # bf16 fast mode also runs the library match single-pass bf16 (the
        # mode is already an approximation; near-tie ranking may flip)
        if knn_precision is None:
            knn_precision = "default" if dtype == "bf16" else "high"
        feat = match_features_pallas_batched(
            feat, tgt, k=k, alpha=alpha, precision=knn_precision,
        )
    elif tgt.shape[0] > 16_384:
        # large library: stream the reference in chunks instead of
        # materializing the [N, Ls, Lr] similarity matrix
        from alivevc_tpu.ops.knn import match_features_chunked

        nb, ls, dd = feat.shape
        feat = match_features_chunked(
            feat.reshape(nb * ls, dd), tgt, k=k, alpha=alpha
        ).reshape(nb, ls, dd)
    else:
        feat = match_features(feat, tgt, k=k, alpha=alpha)
    feat = feat.astype(window.dtype)
    wave, _ = decoder(
        dec_params, feat, f0 * f0_rate, cfg=dec_cfg,
        oscillator_impl="pallas" if impl == "pallas" else "xla",
    )
    return wave.astype(jnp.float32)


def build_target_matrix(
    ce_params,
    target_wave: Optional[np.ndarray] = None,
    library_tokens: Optional[jax.Array] = None,
    decimation: int = 1,
) -> jax.Array:
    """Target matrix [Lr, 768]: encoder output of a target utterance (already
    at 16 kHz, peak-normalized) concatenated with library tokens
    (inference.py:66-82, realtime_inference.py:79-96)."""
    parts = []
    if target_wave is not None:
        w = jnp.asarray(target_wave, jnp.float32)[None, :]
        feat = content_encoder(ce_params, spectrogram(w))[0]
        if decimation > 1:
            feat = feat[::decimation]
        parts.append(feat)
    if library_tokens is not None:
        parts.append(library_tokens)
    if not parts:
        raise ValueError("need a target utterance and/or a voice library")
    return jnp.concatenate(parts, axis=0)


class OfflineConverter:
    """File-level driver mirroring inference.py's chunked overlap-discard."""

    def __init__(
        self,
        ce_params,
        f0_params,
        dec_params,
        tgt: jax.Array,
        cfg: InferenceConfig = InferenceConfig(),
        dec_cfg: DecoderConfig = DecoderConfig(),
        sample_rate: int = 16_000,
        impl: str = "xla",
        world_pitch: bool = False,
        dtype: str = "fp32",
        knn_precision: Optional[str] = None,
    ):
        self.world_pitch = world_pitch
        self.impl = impl
        self.dtype = dtype
        self.knn_precision = knn_precision
        self.ce = ce_params
        self.f0 = f0_params
        self.dec = dec_params
        self.tgt = tgt
        self.cfg = cfg
        self.dec_cfg = dec_cfg
        self.sample_rate = sample_rate

    def convert_16k(self, wave: np.ndarray) -> np.ndarray:
        """wave [L] mono at 16 kHz → converted [L] (peak-normalized input)."""
        cfg = self.cfg
        c = cfg.chunk
        wave = np.asarray(wave, np.float32)
        total = wave.shape[0]
        peak = np.abs(wave).max()
        if peak > 0:
            wave = wave / peak
        # pad + unfold into [M, 3c] windows, stride c (inference.py:96-101)
        padded = np.concatenate([np.zeros(c, np.float32), wave,
                                 np.zeros(4 * c, np.float32)])
        m = (padded.shape[0] - 3 * c) // c + 1
        windows = np.stack([padded[i * c : i * c + 3 * c] for i in range(m)])

        f0_override = None
        if self.world_pitch:
            from alivevc_tpu.ops.world import compute_f0

            f0_override = np.asarray(compute_f0(windows, self.sample_rate))[..., None]

        # Convert in fixed-size window batches so device memory stays bounded
        # on long files; the last batch is zero-padded to the same shape to
        # avoid a tail-shape recompile.
        bsz = max(1, cfg.max_windows_per_step)
        outs = []
        for i in range(0, m, bsz):
            batch = windows[i : i + bsz]
            f0_b = None if f0_override is None else f0_override[i : i + bsz]
            n_real = batch.shape[0]
            pad = bsz - n_real if m > bsz else 0
            if pad:
                batch = np.concatenate([batch, np.zeros((pad,) + batch.shape[1:],
                                                        batch.dtype)])
                if f0_b is not None:
                    f0_b = np.concatenate([f0_b, np.zeros((pad,) + f0_b.shape[1:],
                                                          f0_b.dtype)])
            got = convert_window(
                self.ce, self.f0, self.dec, jnp.asarray(batch), self.tgt,
                cfg.f0_rate, cfg.pitch_shift, cfg.intonation, cfg.k, cfg.alpha,
                self.dec_cfg, self.impl,
                None if f0_b is None else jnp.asarray(f0_b), self.dtype,
                self.knn_precision,
            )
            outs.append(np.asarray(got)[:n_real])
        out = np.concatenate(outs)[:, c:-c].reshape(-1)[:total]
        out = out * (10.0 ** (cfg.gain_db / 20.0))
        if cfg.normalize and np.abs(out).max() > 0:
            out = out / np.abs(out).max()
        return out

    def convert(self, wave: np.ndarray, sr: int) -> np.ndarray:
        """Arbitrary-rate in/out: resample → convert → resample back."""
        if wave.ndim == 2:  # [C, L] or [L, C] → mono (channel axis = shorter)
            wave = wave.mean(axis=0 if wave.shape[0] <= wave.shape[1] else 1)
        if sr != self.sample_rate:
            wave16 = np.asarray(resample(jnp.asarray(wave)[None], sr, self.sample_rate))[0]
        else:
            wave16 = wave
        out16 = self.convert_16k(wave16)
        if sr != self.sample_rate:
            return np.asarray(resample(jnp.asarray(out16)[None], self.sample_rate, sr))[0]
        return out16
