"""VoiceLibrary — learnable 512-token target-speaker embedding bank.

Reference: module/voice_library.py:6-33.  Tokens are stored channels-last
[num_tokens, 768].  ``voice_library_match`` is the *differentiable* variant of
the kNN match (no stop_gradient on the gathered tokens), which is what lets
fine_tune.py's third optimizer train the tokens (SURVEY §2.4.6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from alivevc_tpu.config import VoiceLibraryConfig
from alivevc_tpu.nn.layers import Params
from alivevc_tpu.ops.knn import match_features


def init_voice_library(key, cfg: VoiceLibraryConfig = VoiceLibraryConfig()) -> Params:
    """Gaussian init, matching torch.randn (module/voice_library.py:9)."""
    return {"tokens": jax.random.normal(key, (cfg.num_tokens, cfg.dim))}


def voice_library_match(
    params: Params, source: jax.Array, k: int = 4, alpha: float = 0.0
) -> jax.Array:
    """source [N, Ls, 768] → matched [N, Ls, 768], gradient flows to tokens."""
    return match_features(
        source, params["tokens"], k=k, alpha=alpha, trainable_reference=True
    )
