"""Phase-continuous streaming voice conversion.

Reproduces realtime_inference.py:122-190 as a pure jitted step over an
explicit carried state, so the whole hop (analysis window → conversion →
center-chunk output) is one compiled TPU program:

  state = (ring window [1, W] at 16 kHz, phi [1, 1, Nh])
  step(state, new_chunk) → (state', out_chunk)

The reference recomputes the full 8-chunk (480 ms) window every 60 ms hop and
achieves cross-chunk continuity with `crop` phase re-zeroing plus the carried
principal-value pseudo-phase phi = asin(sin θ) sampled at ``end_of_output``
(module/decoder.py:91-95, realtime_inference.py:166-167).  Audio I/O stays on
the host (io/audio.py); this module is the math.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from alivevc_tpu.config import DecoderConfig, StreamingConfig
from alivevc_tpu.models.content_encoder import content_encoder
from alivevc_tpu.models.decoder import decoder
from alivevc_tpu.models.f0_estimator import f0_estimate
from alivevc_tpu.ops.knn import match_features
from alivevc_tpu.ops.pitch import shift_pitch
from alivevc_tpu.ops.stft import spectrogram


class StreamState(NamedTuple):
    window: jax.Array  # [1, buffer_size*chunk] rolling 16 kHz window
    phi: jax.Array     # [1, 1, num_harmonics] carried pseudo-phase


def init_stream_state(
    cfg: StreamingConfig = StreamingConfig(),
    dec_cfg: DecoderConfig = DecoderConfig(),
) -> StreamState:
    return StreamState(
        window=jnp.zeros((1, cfg.buffer_size * cfg.chunk), jnp.float32),
        phi=jnp.zeros((1, 1, dec_cfg.num_harmonics), jnp.float32),
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "dec_cfg", "k"), donate_argnums=(3,)
)
def streaming_step(
    ce_params,
    f0_params,
    dec_params,
    state: StreamState,
    new_chunk: jax.Array,   # [chunk] fresh 16 kHz samples
    tgt: jax.Array,          # [Lr, 768]
    f0_rate: float = 1.0,
    pitch_shift: float = 0.0,
    k: int = 4,
    alpha: float = 0.0,
    cfg: StreamingConfig = StreamingConfig(),
    dec_cfg: DecoderConfig = DecoderConfig(),
    f0_override=None,   # [1, T, 1] Hz — WORLD pitch (-wpe path)
) -> Tuple[StreamState, jax.Array]:
    """One 60 ms hop.  Returns (state', center chunk [chunk] of output)."""
    chunk = cfg.chunk
    window = jnp.concatenate([state.window[:, chunk:], new_chunk[None, :]], axis=1)

    center = (chunk * cfg.buffer_size) // 2
    begin_out = center - chunk // 2
    end_out = center + chunk // 2

    spec = spectrogram(window)
    content = content_encoder(ce_params, spec)
    if f0_override is not None:
        f0 = f0_override * f0_rate
    else:
        f0 = f0_estimate(f0_params, spec) * f0_rate
    f0 = shift_pitch(f0, pitch_shift)
    content = match_features(content, tgt, k=k, alpha=alpha)
    wave, phi_out = decoder(
        dec_params, content, f0, phi=state.phi, crop=(begin_out, end_out), cfg=dec_cfg
    )
    phi_next = phi_out[:, end_out][:, None, :]
    out = wave[0, begin_out:end_out]
    return StreamState(window=window, phi=phi_next), out


class StreamingConverter:
    """Host-side wrapper holding params/state; feed 16 kHz chunks, get 16 kHz
    converted chunks with ``buffer_size/2`` chunks of latency.

    pipeline_depth=1 overlaps the device round-trip with real time: each
    ``process_chunk`` dispatches hop N, starts an asynchronous device→host
    copy of its output, and returns hop N-1's (already transferred) chunk —
    the per-hop host cost drops from a full dispatch+fetch round trip to the
    dispatch alone, at the price of one extra ``chunk`` (60 ms) of
    algorithmic latency.  The first call returns silence.  pipeline_depth=0
    keeps the reference's synchronous loop semantics
    (realtime_inference.py:122-190)."""

    def __init__(
        self,
        ce_params,
        f0_params,
        dec_params,
        tgt: jax.Array,
        cfg: StreamingConfig = StreamingConfig(),
        dec_cfg: DecoderConfig = DecoderConfig(),
        world_pitch: bool = False,
        pipeline_depth: int = 0,
    ):
        self.ce, self.f0, self.dec = ce_params, f0_params, dec_params
        self.tgt = tgt
        self.cfg = cfg
        self.dec_cfg = dec_cfg
        self.world_pitch = world_pitch
        self.pipeline_depth = pipeline_depth
        self.state = init_stream_state(cfg, dec_cfg)
        self._pending = []      # device arrays awaiting their async host copy

    def reset(self):
        self.state = init_stream_state(self.cfg, self.dec_cfg)
        self._pending = []

    def prime(self, samples: np.ndarray) -> None:
        """Fill the rolling analysis window without converting.

        The reference loop produces no output until its ring holds
        ``buffer_size`` chunks (realtime_inference.py:133-137); priming with
        the first ``buffer_size`` chunks reproduces that warmup discipline
        (and keeps phi untouched at zero, as the reference's is)."""
        samples = np.asarray(samples, np.float32).reshape(-1)
        w = np.asarray(self.state.window)[0]
        window = np.concatenate([w, samples])[-w.shape[0]:]
        self.state = StreamState(
            window=jnp.asarray(window)[None, :], phi=self.state.phi
        )

    def process_chunk(self, chunk: np.ndarray) -> np.ndarray:
        assert chunk.shape == (self.cfg.chunk,)
        f0_override = None
        if self.world_pitch:
            from alivevc_tpu.ops.world import compute_f0

            window = np.concatenate(
                [np.asarray(self.state.window)[0, self.cfg.chunk :], chunk]
            )
            f0_override = jnp.asarray(compute_f0(window[None], 16_000))[..., None]
        self.state, out = streaming_step(
            self.ce, self.f0, self.dec, self.state,
            jnp.asarray(chunk, jnp.float32), self.tgt,
            self.cfg.f0_rate, self.cfg.pitch_shift, self.cfg.k, self.cfg.alpha,
            self.cfg, self.dec_cfg, f0_override,
        )
        if self.pipeline_depth <= 0:
            return np.asarray(out)
        # pipelined: start the D2H copy now, hand back the previous hop
        try:
            out.copy_to_host_async()
        except AttributeError:      # older jax array types
            pass
        self._pending.append(out)
        if len(self._pending) <= self.pipeline_depth:
            return np.zeros(self.cfg.chunk, np.float32)
        return np.asarray(self._pending.pop(0))

    def flush(self) -> list:
        """Drain pipelined hops still in flight (returns [] in sync mode)."""
        outs = [np.asarray(o) for o in self._pending]
        self._pending = []
        return outs
