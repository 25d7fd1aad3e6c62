"""Library-sharded kNN retrieval — the workload's real scale axis.

The voice library (up to millions of 768-d frames at pod scale) is sharded
over a mesh axis; each device computes a *local* top-k over its shard with the
streaming chunked kernel, then the winners are merged in two phases
(VERDICT r3 item 7 follow-up — measured 27x less collective traffic than the
gather-the-vectors merge at the bench shape, scripts/comm_volume.py):

  1. **score merge** — all_gather only the k (similarity, local index) pairs
     per shard (O(Ls * P * k) floats, vector-free) and run the top-k merge
     replicated on every shard; ties resolve by global frame index because
     shard id is the high-order part of the flattened candidate position;
  2. **vector reduce** — each shard sums the 768-d vectors of the global
     winners *it owns* locally, one psum of [Ls, D] adds the partial sums
     across shards, and dividing by k gives the exact top-k mean.

Communication is O(Ls * (P*k + D)) floats, independent of library size —
vs O(Ls * P * k * D) for the naive merge that ships every candidate vector.
Padding rows are excluded with an explicit validity mask, so the merged
result equals the single-device match exactly.

Reference semantics being distributed: module/common.py:96-109.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from alivevc_tpu.ops.knn import topk_cosine_chunked


def pad_library_for_sharding(
    library: jax.Array, num_shards: int
) -> Tuple[jax.Array, jax.Array]:
    """Pad library rows to a multiple of ``num_shards``.

    Returns (padded library, valid mask) — padding rows are masked out of the
    search exactly.
    """
    lr = library.shape[0]
    pad = (-lr) % num_shards
    valid = jnp.arange(lr + pad) < lr
    if pad:
        library = jnp.concatenate(
            [library, jnp.zeros((pad, library.shape[1]), library.dtype)]
        )
    return library, valid


def sharded_match_features(
    mesh: Mesh,
    source: jax.Array,       # [Ls, D] replicated
    library: jax.Array,      # [Lr_padded, D], sharded over axis 0
    valid: jax.Array,        # [Lr_padded] bool, sharded over axis 0
    k: int = 4,
    alpha: float = 0.0,
    axis_name: str = "library",
    chunk: int = 4096,
    impl: str = "auto",
    precision: str = "highest",
) -> jax.Array:
    """match_features with the library sharded across ``axis_name``.

    Output is replicated [Ls, D] and equals the dense single-device result on
    the unpadded library.

    impl: 'xla' (chunked jnp per shard), 'pallas' (fused streaming kernel per
    shard; padding rows excluded exactly — via the dynamic valid-row count
    for the licensed 'default' mode, or a penalty column for the exact
    modes), or 'auto' (pallas on the TPU backend).

    precision: per-shard kernel mode — 'highest' (exact, the parity
    contract), 'high' (bf16x3, ~1e-7-faithful), or 'default' (licensed bf16
    packed two-pass: the pod-scale path pays the same fast kernel as
    single-chip, r5)."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"

    def local_fn(src, lib_shard, valid_shard):
        return local_topk_merge(
            src, lib_shard, valid_shard, k=k, alpha=alpha,
            axis_name=axis_name, chunk=chunk, impl=impl, precision=precision,
        )

    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name)),
        out_specs=P(),
        check_vma=False,
    )
    return fn(source, library, valid)


def local_topk_merge(
    src: jax.Array,          # [Q, D] local queries (replicated or data-sharded)
    lib_shard: jax.Array,    # [Lr/P, D] this device's library shard
    valid_shard: jax.Array,  # [Lr/P] bool
    k: int,
    alpha: float,
    axis_name: str,
    chunk: int,
    impl: str,
    precision: str = "highest",
) -> jax.Array:
    """Per-shard top-k + all_gather merge.  Runs INSIDE shard_map; shared by
    the 1-D sharded match and the 2-D pod conversion (distributed_vc)."""
    if impl == "pallas":
        from alivevc_tpu.kernels.knn_pallas import knn_topk_pallas

        if precision == "default":
            # shard padding is a row SUFFIX (pad_library_for_sharding appends
            # at the global tail), so a dynamic valid-row count excludes it
            # exactly — the licensed 'default' mode keeps the fast packed
            # two-pass kernel at pod scale instead of paying a penalty
            # column (r5)
            vr = jnp.sum(valid_shard.astype(jnp.int32))
            vals, idx = knn_topk_pallas(src, lib_shard, k=k,
                                        precision=precision, valid_rows=vr)
        else:
            pen = jnp.where(valid_shard, 0.0, -4.0).astype(jnp.float32)
            vals, idx = knn_topk_pallas(src, lib_shard, k=k,
                                        precision=precision, penalty=pen)
    else:
        vals, idx = topk_cosine_chunked(
            src, lib_shard, k=k, chunk=min(chunk, lib_shard.shape[0]),
            valid=valid_shard,
        )
    # phase 1: score merge — only (similarity, local index) pairs travel
    all_vals = jax.lax.all_gather(vals, axis_name)  # [P, Q, k]
    all_idx = jax.lax.all_gather(idx, axis_name)    # [P, Q, k] int32
    p = all_vals.shape[0]
    q = src.shape[0]
    flat_vals = jnp.transpose(all_vals, (1, 0, 2)).reshape(q, p * k)
    flat_idx = jnp.transpose(all_idx, (1, 0, 2)).reshape(q, p * k)
    _, top_pos = jax.lax.top_k(flat_vals, k)        # flat position ties ==
    win_shard = top_pos // k                        # global-index ties (shard
    win_local = jnp.take_along_axis(flat_idx, top_pos, axis=1)  # is high part)

    # phase 2: vector reduce — each shard contributes the winners it owns;
    # one [Q, D] psum replaces the [P, Q, k, D] vector gather
    me = jax.lax.axis_index(axis_name)
    vecs = lib_shard[win_local]                     # [Q, k, D] (local gather)
    mine = (win_shard == me)[..., None]
    partial = jnp.sum(jnp.where(mine, vecs, jnp.zeros_like(vecs)), axis=1)
    total = jax.lax.psum(partial, axis_name)        # [Q, D]
    result = total / k
    return result * (1.0 - alpha) + src * alpha
