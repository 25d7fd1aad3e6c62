"""Training losses, matching the reference loops exactly.

  * mel L1 on log(mel+1e-4) with NaN/Inf scrub (train_decoder.py:106-113,141)
  * LSGAN with inverted labels: D trains real→0 / fake→1, G minimises
    logit² (train_decoder.py:143-161; SURVEY §2.4.3)
  * feature-matching: Σ L1 over MPD per-layer + MRD per-item features
    (module/discriminator.py:184-190)
  * content preservation: |content - CE(spec(recon))| (train_decoder.py:142)
  * discriminator/feature losses computed on the center quarter of the wave
    (cut_center_wav, train_decoder.py:80-84; SURVEY §2.4.9)
  * F0 CE with ignore_index=0 — unvoiced frames excluded
    (train_f0_estimator.py:59,73-80)
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from alivevc_tpu.ops.stft import log_mel_spectrogram


def cut_center(x: jax.Array) -> jax.Array:
    """wave [N, L] → center quarter [N, L/4] (train_decoder.py:80-84)."""
    length = x.shape[1]
    center = length // 2
    size = length // 8
    return x[:, center - size : center + size]


def mel_l1_loss(fake: jax.Array, real: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(log_mel_spectrogram(fake) - log_mel_spectrogram(real)))


def generator_adv_loss(logits: List[jax.Array]) -> jax.Array:
    """G minimises Σ mean(logit²) over all sub-discriminator outputs."""
    loss = 0.0
    for l in logits:
        loss = loss + jnp.mean(l * l)
    return loss


def discriminator_adv_loss(
    logits_real: List[jax.Array], logits_fake: List[jax.Array]
) -> jax.Array:
    """D: real → 0, fake → 1 (inverted LSGAN labels)."""
    loss = 0.0
    for l in logits_real:
        loss = loss + jnp.mean(l * l)
    for l in logits_fake:
        loss = loss + jnp.mean((l - 1.0) ** 2)
    return loss


def f0_cross_entropy(logits: jax.Array, f0_hz: jax.Array) -> jax.Array:
    """Per-frame CE with labels floor(f0) and ignore_index=0.

    logits [N, T, 4096], f0_hz [N, T] (or [N, T, 1]).  Mean over non-ignored
    frames, matching torch CrossEntropyLoss(ignore_index=0).
    """
    total, count = f0_cross_entropy_parts(logits, f0_hz)
    return total / jnp.maximum(count, 1)


def f0_cross_entropy_parts(logits: jax.Array, f0_hz: jax.Array):
    """(sum of per-voiced-frame NLL, voiced count) — the reduction parts.

    The data-parallel F0 step psums BOTH parts before dividing, so the
    sharded loss equals the global ignore_index mean exactly even when the
    voiced-frame count differs per shard (a mean-of-per-shard-means would
    weight shards, not frames)."""
    if f0_hz.ndim == 3:
        f0_hz = f0_hz[..., 0]
    labels = jnp.floor(f0_hz).astype(jnp.int32)
    labels = jnp.clip(labels, 0, logits.shape[-1] - 1)
    mask = labels != 0
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return jnp.sum(jnp.where(mask, nll, 0.0)), jnp.sum(mask)
