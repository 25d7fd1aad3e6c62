"""Two-pass fused kNN for the licensed bf16 mode — PRODUCTION path for
``knn_topk_pallas(precision='default')`` with no penalty column
(cf. reference ranking semantics: /root/reference/module/common.py:96-109).

The production kernel (knn_pallas.py) carries a running top-k across library
tiles: each grid step runs the exact masked max/min extraction (24 wide VPU
passes per [Ls, TILE] block) serially after its matmul, and the carry makes
the library-tile grid dimension sequential.  At the bench shape the stage
sits ~30 ms above its 22 ms matmul floor (PERF.md) — extraction-bound.

This variant splits the work:

  * **Pass A** (this kernel): per (query-tile, library-tile), compute the
    sims block on the MXU and extract the tile-local top-k with the
    mantissa-packing trick — the low ``ceil(log2(tile))`` bits of the
    +2-shifted score are overwritten with (tile-1-col), so plain max-reduce
    IS argmax with smaller-column tie-break: 3 wide VPU passes per
    iteration, no int stream, no narrow ops (decoding is deferred).  There
    is NO cross-tile carry, so the grid has no sequential dimension and the
    [Ls, n_tiles, k] packed winners stream to HBM (~180 MB at the bench
    shape, ~0.4 ms of traffic).
  * **Pass B**: one tiny kernel per query tile merges [Ls, n_tiles*k]
    packed candidates — unpack (wide bitcasts), reconstruct global indices,
    exact top-k with global smallest-index tie-break.  ~0.5 G-ops total.

Licensing: identical to the production 'default' mode plus the packing
perturbation (<= 2^ceil(log2(tile)) * 2 ULP at exponent <=1 ~= 1.2e-4 on
the cosine scale at tile=512 — the same order as the bf16 operand noise).
Exact modes keep the production kernel.

Status: interpret-parity tested (tests/test_knn_twopass.py); on-chip A/B
(scripts/bench_knn_twopass.py, 2026-08-20): 36.0 ms / 799k q/s vs 53.7 ms
for the carried kernel at the bench shape — flipped into production.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

_NEG = -jnp.inf
_SHIFT = np.float32(2.0)     # cosine [-1,1] -> [1,3]: exponent in [0,2)


def _tile_kernel(src_ref, lib_ref, out_ref, *, k: int, tile: int, lr: int,
                 nbits: int):
    """Pass A: packed tile-local top-k, no carry, parallel grid."""
    t = pl.program_id(1)
    sims = jax.lax.dot_general(
        src_ref[:], lib_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                        # [Ls, TILE]
    base = t * tile
    col = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1)
    if lr % tile:
        sims = jnp.where(col + base < lr, sims, jnp.float32(-2.0))
    mask = jnp.int32((1 << nbits) - 1)
    bits = jax.lax.bitcast_convert_type(sims + _SHIFT, jnp.int32)
    packed = jax.lax.bitcast_convert_type(
        jnp.bitwise_or(jnp.bitwise_and(bits, ~mask), mask - col), jnp.float32
    )
    outs = []
    for _ in range(k):
        m = jnp.max(packed, axis=1, keepdims=True)           # [Ls, 1]
        outs.append(m)
        packed = jnp.where(packed == m, _NEG, packed)
    out_ref[:] = jnp.concatenate(outs, axis=1)[None]         # [1, Ls, k]


def _merge_kernel(cand_ref, out_v_ref, out_i_ref, *, k: int, tile: int,
                  nbits: int, n_tiles: int):
    """Pass B: exact merge of [Ls, n_tiles*k] packed candidates.

    Global index = tile*TILE + (mask - low bits); value ties break to the
    smallest global index (exact masked max/min extraction, matching
    lax.top_k / the production kernel)."""
    mask = jnp.int32((1 << nbits) - 1)
    cand = cand_ref[:]                                       # [Ls, NT*k]
    bits = jax.lax.bitcast_convert_type(cand, jnp.int32)
    local = mask - jnp.bitwise_and(bits, mask)
    tidx = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 1) // k
    gidx = tidx * tile + local
    # un-packed value: keep the packed float (its low bits are the licensed
    # perturbation); padding columns arrived as -2-shifted and never win
    vals = cand - _SHIFT
    big = jnp.int32(2**30)
    vs, is_ = [], []
    for _ in range(k):
        m = jnp.max(vals, axis=1, keepdims=True)
        at = vals >= m
        sel = jnp.min(jnp.where(at, gidx, big), axis=1, keepdims=True)
        vs.append(m)
        is_.append(sel)
        vals = jnp.where(gidx == sel, _NEG, vals)
    out_v_ref[:] = jnp.concatenate(vs, axis=1)
    out_i_ref[:] = jnp.concatenate(is_, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "tile", "q_tile"))
def knn_topk_twopass(
    source: jax.Array,     # [Ls, D]
    library: jax.Array,    # [Lr, D]
    k: int = 4,
    tile: int = 512,
    q_tile: int = 512,
) -> Tuple[jax.Array, jax.Array]:
    """Licensed bf16 two-pass top-k.  Returns (values [Ls, k], idx [Ls, k])."""
    ls, d = source.shape
    lr = library.shape[0]

    def normalize(x):
        x = x.astype(jnp.float32)
        return x * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(x * x, axis=1, keepdims=True), 1e-30)
        )

    src = normalize(source).astype(jnp.bfloat16)
    lib = normalize(library).astype(jnp.bfloat16)

    q_tile = min(q_tile, -(-ls // 8) * 8)
    ls_pad = (-ls) % q_tile
    if ls_pad:
        src = jnp.pad(src, ((0, ls_pad), (0, 0)))
    lr_pad = (-lr) % tile
    if lr_pad:
        lib = jnp.pad(lib, ((0, lr_pad), (0, 0)))
    n_tiles = lib.shape[0] // tile
    lsp = src.shape[0]
    n_qt = lsp // q_tile
    nbits = max(tile - 1, 1).bit_length()

    cand = pl.pallas_call(
        functools.partial(_tile_kernel, k=k, tile=tile, lr=lr, nbits=nbits),
        grid=(n_qt, n_tiles),
        in_specs=[
            pl.BlockSpec((q_tile, d), lambda q, t: (q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda q, t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_tile, k), lambda q, t: (t, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, lsp, k), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(src, lib)

    cand2 = jnp.transpose(cand, (1, 0, 2)).reshape(lsp, n_tiles * k)
    vals, idx = pl.pallas_call(
        functools.partial(_merge_kernel, k=k, tile=tile, nbits=nbits,
                          n_tiles=n_tiles),
        grid=(n_qt,),
        in_specs=[
            pl.BlockSpec((q_tile, n_tiles * k), lambda q: (q, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q_tile, k), lambda q: (q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, k), lambda q: (q, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((lsp, k), jnp.float32),
            jax.ShapeDtypeStruct((lsp, k), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(cand2)
    return vals[:ls], idx[:ls]
