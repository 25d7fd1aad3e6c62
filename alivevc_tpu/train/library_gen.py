"""Voice-library generation from target-speaker audio.

Reference: generate_voice_library.py:21-43 — 512 random 7,680-sample chunks;
for each, the content frame at a random index in [0, 8) is written to a
*random* token slot in [0, 512) (collisions overwrite sequentially; unhit
slots keep their Gaussian init — SURVEY §2.4.7).  The library is expected to
be fine-tuned afterwards.

TPU-native: all chunks are encoded as one batch (one MXU-dense forward);
the random scatter is sequential-overwrite semantics, done host-side on the
tiny [512, 768] token matrix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from alivevc_tpu.config import VoiceLibraryConfig
from alivevc_tpu.models.content_encoder import content_encoder
from alivevc_tpu.models.voice_library import init_voice_library
from alivevc_tpu.ops.stft import spectrogram


def generate_voice_library(
    ce_params,
    chunks: np.ndarray,            # [M, 7680] target-speaker chunks at 16 kHz
    seed: int = 0,
    cfg: VoiceLibraryConfig = VoiceLibraryConfig(),
    batch_size: int = 64,
) -> dict:
    """Build a library pytree {'tokens': [num_tokens, 768]}."""
    rng = np.random.default_rng(seed)
    params = init_voice_library(jax.random.PRNGKey(seed), cfg)
    tokens = np.array(params["tokens"])  # writable host copy

    m = min(chunks.shape[0], cfg.num_tokens)
    feats = []
    for i in range(0, m, batch_size):
        batch = jnp.asarray(chunks[i : i + batch_size], jnp.float32)
        feats.append(np.asarray(content_encoder(ce_params, spectrogram(batch))))
    feats = np.concatenate(feats, axis=0)        # [M, T, 768]

    n_frames = feats.shape[1]
    for i in range(m):
        slot = rng.integers(0, cfg.num_tokens)
        frame = rng.integers(0, min(8, n_frames))
        tokens[slot] = feats[i, frame]
    return {"tokens": jnp.asarray(tokens)}
