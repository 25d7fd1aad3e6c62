"""kNN feature matching — the conversion core of the framework.

Reproduces ``match_features`` (module/common.py:96-109) and
``VoiceLibrary.match`` (module/voice_library.py:15-33) semantics in a
channels-last layout:

  * cosine similarity between every source frame and every reference frame,
  * top-k (k=4) most similar reference frames per source frame,
  * output = mean of those k **unnormalized** reference vectors,
  * blended with the source: ``out*(1-alpha) + source*alpha``.

Gradient semantics match the reference: ``match_features`` detaches the
gathered reference (torch runs the whole match under no_grad and only the
alpha-blend keeps source grads), while the voice-library variant keeps the
gather differentiable so library tokens can train (fine_tune.py:127-170).

The dense path is a single [Ls, D] x [D, Lr] matmul (MXU) + lax.top_k.  For
large libraries ``topk_cosine_chunked`` streams the reference in chunks with a
running top-k merge (O(Ls * k) state), which is also the building block of the
library-sharded multi-chip path (parallel/sharded_knn.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _l2_normalize(x: jax.Array, eps: float = 0.0) -> jax.Array:
    n = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    if eps:
        n = jnp.maximum(n, eps)
    return x / n


def cosine_topk(
    source: jax.Array, reference: jax.Array, k: int = 4
) -> Tuple[jax.Array, jax.Array]:
    """Top-k cosine similarities.

    source: [..., Ls, D], reference: [..., Lr, D] (broadcastable batch dims).
    Returns (values [..., Ls, k], indices [..., Ls, k]).
    """
    sn = _l2_normalize(source)
    rn = _l2_normalize(reference)
    sims = jnp.einsum("...sd,...rd->...sr", sn, rn)
    return jax.lax.top_k(sims, k)


@functools.partial(jax.jit, static_argnums=(2, 4))
def match_features(
    source: jax.Array,
    reference: jax.Array,
    k: int = 4,
    alpha: float = 0.0,
    trainable_reference: bool = False,
) -> jax.Array:
    """kNN-VC feature replacement (module/common.py:96-109), channels-last.

    source: [N, Ls, D]; reference: [N, Lr, D] or [Lr, D] (shared across batch).
    Set ``trainable_reference=True`` for VoiceLibrary.match semantics (gradient
    flows into the gathered reference vectors).
    """
    ref = reference if reference.ndim == source.ndim else jnp.broadcast_to(
        reference, source.shape[:-2] + reference.shape
    )
    _, idx = cosine_topk(source, ref, k)  # [N, Ls, k]
    gather_src = ref if trainable_reference else jax.lax.stop_gradient(ref)
    # [N, 1, Lr, D] gathered at [N, Ls, k, 1] → [N, Ls, k, D]
    gathered = jnp.take_along_axis(
        gather_src[..., None, :, :], idx[..., None], axis=-2
    )
    result = jnp.mean(gathered, axis=-2)
    return result * (1.0 - alpha) + source * alpha


def _merge_topk(
    vals_a: jax.Array, idx_a: jax.Array, vals_b: jax.Array, idx_b: jax.Array, k: int
) -> Tuple[jax.Array, jax.Array]:
    """Merge two top-k candidate sets along the last axis."""
    vals = jnp.concatenate([vals_a, vals_b], axis=-1)
    idx = jnp.concatenate([idx_a, idx_b], axis=-1)
    top_vals, top_pos = jax.lax.top_k(vals, k)
    return top_vals, jnp.take_along_axis(idx, top_pos, axis=-1)


@functools.partial(jax.jit, static_argnums=(2, 3))
def topk_cosine_chunked(
    source: jax.Array,
    reference: jax.Array,
    k: int = 4,
    chunk: int = 8192,
    valid=None,
) -> Tuple[jax.Array, jax.Array]:
    """Streaming top-k over a large reference.

    source: [Ls, D], reference: [Lr, D].  The reference is scanned in
    ``chunk``-row tiles; only the running [Ls, k] top-k state is kept, so HBM
    footprint is independent of Lr.  Returns (values, global indices).

    ``valid``: optional [Lr] bool mask — invalid rows can never be selected
    (used by the sharded path to mask padding rows exactly).
    """
    ls, d = source.shape
    lr = reference.shape[0]
    sn = _l2_normalize(source)

    pad = (-lr) % chunk
    if valid is None:
        valid = jnp.ones((lr,), dtype=bool)
    if pad:
        reference = jnp.pad(reference, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    n_chunks = reference.shape[0] // chunk
    ref_chunks = reference.reshape(n_chunks, chunk, d)
    valid_chunks = valid.reshape(n_chunks, chunk)

    neg = jnp.full((ls, k), -jnp.inf, dtype=jnp.float32)
    idx0 = jnp.zeros((ls, k), dtype=jnp.int32)

    def body(carry, inp):
        best_v, best_i = carry
        c, ref_c, valid_c = inp
        rn = _l2_normalize(ref_c)
        sims = (sn @ rn.T).astype(jnp.float32)  # [Ls, chunk]
        sims = jnp.where(valid_c[None, :], sims, -jnp.inf)
        v, i = jax.lax.top_k(sims, k)
        best_v, best_i = _merge_topk(best_v, best_i, v, i + c * chunk, k)
        return (best_v, best_i), None

    (vals, idx), _ = jax.lax.scan(
        body, (neg, idx0), (jnp.arange(n_chunks), ref_chunks, valid_chunks)
    )
    return vals, idx


@functools.partial(jax.jit, static_argnums=(2, 4))
def match_features_chunked(
    source: jax.Array,
    reference: jax.Array,
    k: int = 4,
    alpha: float = 0.0,
    chunk: int = 8192,
) -> jax.Array:
    """``match_features`` for unbatched [Ls, D] source against a huge
    [Lr, D] reference, streamed in chunks."""
    _, idx = topk_cosine_chunked(source, reference, k, chunk)
    gathered = jax.lax.stop_gradient(reference)[idx]  # [Ls, k, D]
    result = jnp.mean(gathered, axis=-2)
    return result * (1.0 - alpha) + source * alpha
