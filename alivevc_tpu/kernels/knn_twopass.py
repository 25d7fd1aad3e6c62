"""Two-pass fused kNN — production path for ``knn_topk_pallas``
(cf. reference ranking semantics: /root/reference/module/common.py:96-109).

The carried kernel (knn_pallas.py) keeps a running top-k across library
tiles: each grid step runs the exact masked max/min extraction serially
after its matmul, and the carry makes the library-tile grid dimension
sequential.  At the bench shape that leaves every mode 30+ ms above its
matmul floor (PERF.md) — extraction-bound.

This variant splits the work so BOTH grid dimensions are parallel:

  * **Pass A**: per (query-tile, library-tile), compute the sims block on
    the MXU and extract the tile-local top-k.  Two extraction modes:

      - ``packed`` (licensed bf16 'default' only): the low
        ``ceil(log2(tile))`` bits of the +2-shifted score are overwritten
        with (tile-1-col), so plain max-reduce IS argmax with
        smaller-column tie-break — 3 wide VPU passes per iteration, no int
        stream.  The base mantissa is rounded to nearest (r5): packing
        error <= 2^(nbits-1) ULP at exponent <=1 ~= 6e-5 on the cosine
        scale at tile=512, half the r4 truncation error — measured on-chip
        it buys back most of the top-k flip-rate margin
        (tests/test_bf16_license.py).
      - ``exact`` (all precision modes + the penalty path): the same
        masked max/min extraction as the carried kernel, but tile-local —
        values AND int32 indices stream to HBM.  No packing, no license:
        ranking is bit-identical to the carried kernel's.

    There is NO cross-tile carry, so the [n_tiles, Ls, k] winners stream
    to HBM (~90-180 MB at the bench shape, <0.5 ms of traffic).
  * **Pass B**: per query tile, merge the [Ls, n_tiles*k] candidates —
    exact top-k with global smallest-index tie-break.  When the candidate
    width exceeds ``_MERGE_MAX`` columns (large libraries), the merge runs
    hierarchically in column chunks, so pass-B VMEM stays bounded
    regardless of library size (advisor r4 item).

Status: interpret-parity tested (tests/test_knn_twopass.py); on-chip A/B
(scripts/bench_knn_twopass.py): packed 36.0 ms / 799k q/s vs 53.7 ms for
the carried kernel at the bench shape.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

_NEG = -jnp.inf
_SHIFT = np.float32(2.0)     # cosine [-1,1] -> [1,3]: exponent in [0,2)
_BIG = np.int32(2**30)
_MERGE_MAX = 2048            # max candidate columns per merge kernel block


def _tile_kernel(src_ref, lib_ref, out_ref, *, k: int, tile: int, lr: int,
                 nbits: int, vr_ref=None):
    """Pass A, packed extraction: tile-local top-k, no carry, parallel grid.

    vr_ref (optional [1,1] SMEM int32): dynamic valid-row count — rows at
    index >= vr are excluded exactly (the sharded-retrieval path's shard
    padding is always a row SUFFIX, so no penalty column is needed and the
    licensed packed extraction applies unchanged)."""
    t = pl.program_id(1)
    sims = jax.lax.dot_general(
        src_ref[:], lib_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                        # [Ls, TILE]
    base = t * tile
    col = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1)
    if vr_ref is not None:
        sims = jnp.where(col + base < vr_ref[0, 0], sims, jnp.float32(-2.0))
    elif lr % tile:
        sims = jnp.where(col + base < lr, sims, jnp.float32(-2.0))
    mask = jnp.int32((1 << nbits) - 1)
    half = jnp.int32(1 << (nbits - 1))
    low = mask - col
    bits = jax.lax.bitcast_convert_type(sims + _SHIFT, jnp.int32)
    # round the kept base to NEAREST representable (base<<nbits | low):
    # |packed - true| <= 2^(nbits-1) ULP, half the plain truncate-and-or
    # error.  max(.,0) guards the padded columns (bits==0) from wrapping
    # negative (a negative int32 bitcasts to a negative float / NaN).
    base_bits = jnp.bitwise_and(
        jnp.maximum(bits - low + half, 0), ~mask
    )
    packed = jax.lax.bitcast_convert_type(base_bits + low, jnp.float32)
    outs = []
    for _ in range(k):
        m = jnp.max(packed, axis=1, keepdims=True)           # [Ls, 1]
        outs.append(m)
        packed = jnp.where(packed == m, _NEG, packed)
    out_ref[:] = jnp.concatenate(outs, axis=1)[None]         # [1, Ls, k]


def _tile_kernel_exact(src_ref, lib_ref, out_v_ref, out_i_ref, *, k: int,
                       tile: int, lr: int, precision):
    """Pass A, exact extraction: tile-local top-k values + int32 indices."""
    t = pl.program_id(1)
    sims = jax.lax.dot_general(
        src_ref[:], lib_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )                                                        # [Ls, TILE]
    base = t * tile
    col = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1)
    gidx = col + base
    if lr % tile:
        # -inf (not -2): the penalty path shifts real scores below -2
        sims = jnp.where(gidx < lr, sims, _NEG)
    vs, is_ = [], []
    for _ in range(k):
        m = jnp.max(sims, axis=1, keepdims=True)
        sel = jnp.min(jnp.where(sims >= m, gidx, _BIG), axis=1, keepdims=True)
        vs.append(m)
        is_.append(sel)
        sims = jnp.where(gidx == sel, _NEG, sims)
    out_v_ref[:] = jnp.concatenate(vs, axis=1)[None]         # [1, Ls, k]
    out_i_ref[:] = jnp.concatenate(is_, axis=1)[None]


def _merge_packed_kernel(cand_ref, out_v_ref, out_i_ref, *, k: int, tile: int,
                         nbits: int, tiles_per_chunk: int):
    """Pass B over packed candidates: decode + exact top-k merge.

    Global index = (chunk_base + tile)*TILE + (mask - low bits); value ties
    break to the smallest global index (matching lax.top_k / the carried
    kernel)."""
    c = pl.program_id(1)
    mask = jnp.int32((1 << nbits) - 1)
    cand = cand_ref[:]                                       # [Ls, NTc*k]
    bits = jax.lax.bitcast_convert_type(cand, jnp.int32)
    local = mask - jnp.bitwise_and(bits, mask)
    tidx = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 1) // k
    gidx = (c * tiles_per_chunk + tidx) * tile + local
    # un-packed value: keep the packed float (its low bits are the licensed
    # perturbation); padding columns arrived as -2-shifted and never win
    vals = cand - _SHIFT
    vs, is_ = [], []
    for _ in range(k):
        m = jnp.max(vals, axis=1, keepdims=True)
        sel = jnp.min(jnp.where(vals >= m, gidx, _BIG), axis=1, keepdims=True)
        vs.append(m)
        is_.append(sel)
        vals = jnp.where(gidx == sel, _NEG, vals)
    out_v_ref[:] = jnp.concatenate(vs, axis=1)
    out_i_ref[:] = jnp.concatenate(is_, axis=1)


def _merge_exact_kernel(val_ref, idx_ref, out_v_ref, out_i_ref, *, k: int):
    """Exact top-k merge of (value, index) candidate pairs."""
    vals = val_ref[:]                                        # [Ls, C]
    gidx = idx_ref[:]
    vs, is_ = [], []
    for _ in range(k):
        m = jnp.max(vals, axis=1, keepdims=True)
        sel = jnp.min(jnp.where(vals >= m, gidx, _BIG), axis=1, keepdims=True)
        vs.append(m)
        is_.append(sel)
        vals = jnp.where(gidx == sel, _NEG, vals)
    out_v_ref[:] = jnp.concatenate(vs, axis=1)
    out_i_ref[:] = jnp.concatenate(is_, axis=1)


def _merge_exact(vals: jax.Array, idx: jax.Array, k: int, n_qt: int,
                 q_tile: int) -> Tuple[jax.Array, jax.Array]:
    """Hierarchical exact merge of [Ls, C] (value, index) candidates down to
    [Ls, k].  Chunks the candidate columns so each merge block is at most
    _MERGE_MAX wide — VMEM stays bounded for arbitrarily large libraries."""
    lsp = vals.shape[0]
    while vals.shape[1] > k:
        c = vals.shape[1]
        if c <= _MERGE_MAX:
            n_ch, cw = 1, c
        else:
            # chunk width must be a multiple of 128 lanes (Mosaic block
            # constraint) AND of k (candidate-group boundaries); 128*k
            # satisfies both for any k
            unit = 128 * k // math.gcd(128, k)
            n_ch = -(-c // _MERGE_MAX)
            cw = min(-(-(-(-c // n_ch)) // unit) * unit, _MERGE_MAX)
            n_ch = -(-c // cw)
            pad = n_ch * cw - c
            if pad:
                vals = jnp.pad(vals, ((0, 0), (0, pad)),
                               constant_values=-np.inf)
                idx = jnp.pad(idx, ((0, 0), (0, pad)),
                              constant_values=2**30)
        out_w = n_ch * k
        nv, ni = pl.pallas_call(
            functools.partial(_merge_exact_kernel, k=k),
            grid=(n_qt, n_ch),
            in_specs=[
                pl.BlockSpec((q_tile, cw), lambda q, c_: (q, c_),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((q_tile, cw), lambda q, c_: (q, c_),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((q_tile, k), lambda q, c_: (q, c_),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((q_tile, k), lambda q, c_: (q, c_),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((lsp, out_w), jnp.float32),
                jax.ShapeDtypeStruct((lsp, out_w), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
        )(vals, idx)
        assert nv.shape[1] < vals.shape[1] or nv.shape[1] == k, (
            "merge made no progress", vals.shape, nv.shape)
        vals, idx = nv, ni
    return vals, idx


def _prep_operands(source, library, precision, penalty):
    """Normalize + precision-mode operand prep (shared with knn_pallas)."""
    ls, d = source.shape
    lr = library.shape[0]

    def normalize(x):
        x = x.astype(jnp.float32)
        return x * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(x * x, axis=1, keepdims=True), 1e-30)
        )

    src = normalize(source)
    lib = normalize(library)
    if penalty is not None:
        src = jnp.concatenate([src, jnp.ones((ls, 1), src.dtype)], axis=1)
        lib = jnp.concatenate(
            [lib, penalty.astype(lib.dtype)[:, None]], axis=1
        )
    if precision == "default":
        src = src.astype(jnp.bfloat16)
        lib = lib.astype(jnp.bfloat16)
    elif precision == "high":
        # manual bf16x3 by operand widening (see knn_pallas for the
        # derivation): [s_hi, s_hi, s_lo] . [l_hi, l_lo, l_hi]
        def split(x):
            hi = x.astype(jnp.bfloat16)
            lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return hi, lo

        s_hi, s_lo = split(src)
        l_hi, l_lo = split(lib)
        src = jnp.concatenate([s_hi, s_hi, s_lo], axis=1)
        lib = jnp.concatenate([l_hi, l_lo, l_hi], axis=1)
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    return src, lib, prec


@functools.partial(
    jax.jit, static_argnames=("k", "tile", "q_tile", "precision")
)
def knn_topk_twopass(
    source: jax.Array,     # [Ls, D]
    library: jax.Array,    # [Lr, D]
    k: int = 4,
    tile: int = 512,
    q_tile: int = 512,
    precision: str = "default",
    penalty: jax.Array | None = None,
    valid_rows: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Two-pass parallel-grid top-k.  Returns (values [Ls, k], idx [Ls, k]).

    precision='default' with no penalty uses the licensed packed extraction
    (mantissa-packing perturbation <= 2^(nbits-1) ULP); every other mode —
    'high', 'highest', or any penalty column — uses exact per-tile
    extraction and is ranking-identical to the carried kernel.

    valid_rows: optional dynamic scalar — rows at index >= valid_rows are
    excluded exactly.  This is the sharded-retrieval fast path: shard
    padding is always a row suffix, so the licensed packed kernel can skip
    the penalty column (and its exact-extraction cost) entirely."""
    ls, d = source.shape
    lr = library.shape[0]
    assert lr >= k, f"library has {lr} rows < k={k}"
    # the packed license bound scales as 2^ceil(log2(tile)): clamp so a
    # nonstandard tile cannot silently grow the licensed error (advisor r4)
    tile = min(tile, 512)
    packed = precision == "default" and penalty is None

    src, lib, prec = _prep_operands(source, library, precision, penalty)
    d_op = src.shape[1]

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

    in_specs = [
        pl.BlockSpec((q_tile, d_op), lambda q, t: (q, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, d_op), lambda q, t: (t, 0),
                     memory_space=pltpu.VMEM),
    ]
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel"),
        vmem_limit_bytes=64 * 1024 * 1024,
    )
    out_spec = pl.BlockSpec((1, q_tile, k), lambda q, t: (t, q, 0),
                            memory_space=pltpu.VMEM)

    if packed:
        if valid_rows is not None:
            # vr > Lr would let zero-padded rows (cosine 0) into the top-k
            valid_rows = jnp.minimum(
                jnp.asarray(valid_rows, jnp.int32), jnp.int32(lr)
            )
            kern = functools.partial(_tile_kernel, k=k, tile=tile, lr=lr,
                                     nbits=nbits)
            cand = pl.pallas_call(
                lambda vr, s, l, o: kern(s, l, o, vr_ref=vr),
                grid=(n_qt, n_tiles),
                in_specs=[
                    pl.BlockSpec((1, 1), lambda q, t: (0, 0),
                                 memory_space=pltpu.SMEM),
                    *in_specs,
                ],
                out_specs=out_spec,
                out_shape=jax.ShapeDtypeStruct((n_tiles, lsp, k), jnp.float32),
                compiler_params=params,
            )(jnp.asarray(valid_rows, jnp.int32).reshape(1, 1), src, lib)
        else:
            cand = pl.pallas_call(
                functools.partial(_tile_kernel, k=k, tile=tile, lr=lr,
                                  nbits=nbits),
                grid=(n_qt, n_tiles),
                in_specs=in_specs,
                out_specs=out_spec,
                out_shape=jax.ShapeDtypeStruct((n_tiles, lsp, k), jnp.float32),
                compiler_params=params,
            )(src, lib)
        cand2 = jnp.transpose(cand, (1, 0, 2)).reshape(lsp, n_tiles * k)
        # first merge level decodes the packing; chunked when wide so VMEM
        # stays bounded at large libraries (advisor r4)
        width = n_tiles * k
        if width <= _MERGE_MAX:
            n_ch, tpc = 1, n_tiles
        else:
            # chunk width tpc*k must be a 128-lane multiple (Mosaic block
            # constraint), so round tiles-per-chunk up accordingly
            unit_t = 128 // math.gcd(k, 128)
            n_ch = -(-width // _MERGE_MAX)
            tpc = min(-(-(-(-n_tiles // n_ch)) // unit_t) * unit_t,
                      _MERGE_MAX // k)
            n_ch = -(-n_tiles // tpc)
            pad_t = n_ch * tpc - n_tiles
            if pad_t:
                # padded candidates decode to value -2-eps, never win
                cand2 = jnp.pad(cand2, ((0, 0), (0, pad_t * k)))
        cw = tpc * k
        vals, idx = pl.pallas_call(
            functools.partial(_merge_packed_kernel, k=k, tile=tile,
                              nbits=nbits, tiles_per_chunk=tpc),
            grid=(n_qt, n_ch),
            in_specs=[
                pl.BlockSpec((q_tile, cw), lambda q, c: (q, c),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((q_tile, k), lambda q, c: (q, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((q_tile, k), lambda q, c: (q, c),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((lsp, n_ch * k), jnp.float32),
                jax.ShapeDtypeStruct((lsp, n_ch * k), jnp.int32),
            ],
            compiler_params=params,
        )(cand2)
        if n_ch > 1:
            vals, idx = _merge_exact(vals, idx, k, n_qt, q_tile)
    else:
        cv, ci = pl.pallas_call(
            functools.partial(_tile_kernel_exact, k=k, tile=tile, lr=lr,
                              precision=prec),
            grid=(n_qt, n_tiles),
            in_specs=in_specs,
            out_specs=[out_spec, out_spec],
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles, lsp, k), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles, lsp, k), jnp.int32),
            ],
            compiler_params=params,
        )(src, lib)
        cv = jnp.transpose(cv, (1, 0, 2)).reshape(lsp, n_tiles * k)
        ci = jnp.transpose(ci, (1, 0, 2)).reshape(lsp, n_tiles * k)
        vals, idx = _merge_exact(cv, ci, k, n_qt, q_tile)
    return vals[:ls], idx[:ls]
