"""Pallas TPU kernel: fused cosine top-k over a voice library.

The dense jnp path (ops/knn.py) materializes the full [Ls, Lr] similarity
matrix in HBM (≈180 MB per window at Lr=100k) and then runs lax.top_k over
it.  This kernel streams the library through VMEM tile by tile, computes each
[Ls, TILE] similarity block on the MXU, and maintains the running per-query
top-k *inside* the kernel — HBM traffic is exactly one read of the library
plus [Ls, k] outputs, independent of Lr.

Top-k per tile is k=4 iterations of (masked max → index via masked min over
global indices → mask out), which reproduces lax.top_k's smallest-index tie
breaking exactly.  The k carried candidates ride in VMEM scratch across the
sequential TPU grid.

Reference semantics: module/common.py:96-109 (cosine similarity of
L2-normalized frames, mean of top-k *unnormalized* library vectors).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -jnp.inf


def _extract_topk(sims, gidx, k: int):
    """k iterations of masked max/min extraction.  sims [Ls, C] fp32,
    gidx [Ls, C] int32 (unique per row).  Returns ([Ls, k], [Ls, k])."""
    vals, idxs = [], []
    big = jnp.int32(2**30)
    for _ in range(k):
        m = jnp.max(sims, axis=1, keepdims=True)                      # [Ls, 1]
        at_max = sims >= m
        sel = jnp.min(jnp.where(at_max, gidx, big), axis=1, keepdims=True)
        vals.append(m)
        idxs.append(sel)
        sims = jnp.where(gidx == sel, _NEG, sims)
    return jnp.concatenate(vals, axis=1), jnp.concatenate(idxs, axis=1)


_SUB = 128                      # fast-path subtile width (7 index bits)
_SHIFT = __import__("numpy").float32(2.0)  # cosine [-1,1] -> shifted [1,3]


def _pack_topk(sims, base, k: int):
    """Subtile-local top-k via index-packed floats — the fast-path extraction.

    ``sims`` is a [Ls, _SUB] cosine block (penalty-free fast path only, so
    every real value is in [-1, 1]; padding columns arrive pre-set to -2).
    Shifting by +2 makes everything positive with exponent in [0, 2): the
    low 7 mantissa bits can then be overwritten with (_SUB-1-col) and float
    comparison stays monotone.  Each of the k iterations is 3 VPU passes
    (max-reduce, compare, select) instead of the exact path's 5 plus an
    int32 index stream — and no [Ls, C+k] concat per tile.

    The packing perturbs values by <= _SUB ULPs at exponent <= 1, i.e.
    <= 2^7 * 2 * 2^-23 ~= 3.1e-5 absolute on the cosine scale — below the
    ~1e-4 score noise the bf16 operands already carry, so it cannot
    meaningfully change which near-ties flip.  Exact ties break toward the
    smaller column (larger packed low bits).  Licensed only for the
    approximate bf16 mode; the fp32 path keeps the exact extraction.

    Returns (vals [Ls, k] packed-shifted floats, idx [Ls, k] global int32).
    """
    col = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1)
    bits = jax.lax.bitcast_convert_type(sims + _SHIFT, jnp.int32)
    low = (_SUB - 1) - col
    packed = jax.lax.bitcast_convert_type(
        jnp.bitwise_or(jnp.bitwise_and(bits, jnp.int32(~(_SUB - 1))), low),
        jnp.float32,
    )
    vals, idxs = [], []
    for _ in range(k):
        m = jnp.max(packed, axis=1, keepdims=True)                  # [Ls, 1]
        mbits = jax.lax.bitcast_convert_type(m, jnp.int32)
        sel = (_SUB - 1) - jnp.bitwise_and(mbits, jnp.int32(_SUB - 1))
        vals.append(m)
        idxs.append(sel + base)
        packed = jnp.where(packed == m, _NEG, packed)
    return jnp.concatenate(vals, axis=1), jnp.concatenate(idxs, axis=1)


def _knn_kernel_fast(src_ref, lib_ref, out_v_ref, out_i_ref, vals_scr, idx_scr,
                     *, k: int, tile: int, lr: int, precision):
    """bf16 fast-path kernel: packed subtile-local top-k (3 passes/iter over
    each [Ls, 128] slice of the tile) + one exact [Ls, (tile/128+1)*k] merge
    against the running carry.  Padding columns (gidx >= lr) are excluded by
    the -2 pre-shift guard below (any real cosine >= -1 beats them)."""
    t = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        vals_scr[:] = jnp.full_like(vals_scr, _NEG)
        idx_scr[:] = jnp.full_like(idx_scr, 2**30)

    sims = jax.lax.dot_general(
        src_ref[:], lib_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )                                                                  # [Ls, TILE]
    base = t * tile
    if lr % tile:
        col = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1)
        sims = jnp.where(col + base < lr, sims, jnp.float32(-2.0))

    ls = sims.shape[0]
    cand_v = [vals_scr[:, :k]]
    cand_i = [idx_scr[:, :k]]
    for s in range(tile // _SUB):
        sub = jax.lax.slice(sims, (0, s * _SUB), (ls, (s + 1) * _SUB))
        tv, ti = _pack_topk(sub, base + s * _SUB, k)
        cand_v.append(tv)
        cand_i.append(ti)
    # exact tiny merge (carry first so equal packed values prefer earlier
    # tiles; across subtiles the global index breaks remaining value ties)
    new_v, new_i = _extract_topk(
        jnp.concatenate(cand_v, axis=1), jnp.concatenate(cand_i, axis=1), k
    )
    vals_scr[:, :k] = new_v
    idx_scr[:, :k] = new_i

    @pl.when(t == nt - 1)
    def _():
        # un-shift so returned values stay on the cosine scale (low index
        # bits remain baked in: |err| <= ~3e-5, licensed for this mode)
        out_v_ref[:] = vals_scr[:, :k] - _SHIFT
        out_i_ref[:] = idx_scr[:, :k]


def _knn_kernel(src_ref, lib_ref, out_v_ref, out_i_ref, vals_scr, idx_scr,
                *, k: int, tile: int, lr: int, precision):
    """Straight-line per-tile matmul + extraction.  A manually
    software-pipelined variant (extract tile t-1 from a VMEM sims scratch
    while tile t's matmul drains) was measured 1.6-2.8x SLOWER at the bench
    shape (170→270 ms fp32-highest, 55→154 ms bf16): Mosaic's grid pipeline
    already double-buffers the blocks and overlaps MXU/VPU work, and the
    scratch round-trip only added VMEM traffic and a serializing hazard."""
    t = pl.program_id(1)          # library tile (minor grid dim)
    nt = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        vals_scr[:] = jnp.full_like(vals_scr, _NEG)
        idx_scr[:] = jnp.full_like(idx_scr, 2**30)

    # both operands arrive L2-normalized (done once in XLA — cheaper than a
    # per-tile sublane->lane norm transpose in here)
    sims = jax.lax.dot_general(
        src_ref[:], lib_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )                                                                  # [Ls, TILE]

    base = t * tile
    col = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1)
    gidx = col + base
    sims = jnp.where(gidx < lr, sims, _NEG)

    # single-stage: extract straight over the [Ls, TILE+k] carry concat.
    # A two-stage variant (aligned [Ls, TILE] extraction + tiny [Ls, 2k]
    # carry merge) measured +23 ms at the bench shape across ALL precision
    # modes: the tiny merge's 16 narrow passes are latency-bound and add
    # ~2 us to each of the ~11k grid steps, dwarfing what the aligned width
    # saves.  Fewer passes beats aligned lanes here.
    comb_v = jnp.concatenate([vals_scr[:, :k], sims], axis=1)
    comb_i = jnp.concatenate([idx_scr[:, :k], gidx], axis=1)
    new_v, new_i = _extract_topk(comb_v, comb_i, k)
    vals_scr[:, :k] = new_v
    idx_scr[:, :k] = new_i

    @pl.when(t == nt - 1)
    def _():
        out_v_ref[:] = vals_scr[:, :k]
        out_i_ref[:] = idx_scr[:, :k]


@functools.partial(
    jax.jit, static_argnames=("k", "tile", "precision", "q_tile", "extraction")
)
def knn_topk_pallas(
    source: jax.Array,     # [Ls, D] (not necessarily normalized)
    library: jax.Array,    # [Lr, D]
    k: int = 4,
    tile: int = 512,
    precision: str = "highest",
    q_tile: int = 512,
    penalty: jax.Array | None = None,   # [Lr] additive score bias (see below)
    extraction: str = "auto",           # 'auto' | 'packed' | 'exact'
    valid_rows: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Streaming fused top-k.  Returns (values [Ls, k], indices [Ls, k]).

    penalty: optional per-row additive bias applied to the cosine scores via
    an augmented feature column (src gains a constant 1, library row i gains
    penalty[i]); rows with penalty <= -4 can never outrank any real cosine
    (which lives in [-1, 1]) while rows with penalty 0 keep their exact
    score.  Used by the sharded retrieval path to exclude padding rows.

    valid_rows: optional dynamic scalar — rows at index >= valid_rows are
    excluded exactly (suffix exclusion only).  The sharded 'default' path
    uses this instead of a penalty column: shard padding is always a row
    suffix, so the licensed packed two-pass kernel applies at full speed.

    precision: 'highest' → 6-pass bf16 MXU (exact near-tie ranking, parity
    with the fp32 reference); 'high' → bf16x3 via operand widening (3 MXU
    passes, scores f32-faithful to ~1e-7); 'default' → single-pass bf16
    operands with f32 accumulation (fastest, can flip near-ties).  All
    modes use the exact masked max/min extraction by default; the packed-
    index extraction (extraction='packed') measured 3.6x slower on-chip.

    The grid iterates library tiles fastest, so the library streams from HBM
    once per *query* tile — q_tile is therefore the library-bandwidth lever.
    The scoped-VMEM budget (16 MB) is dominated by the [q_tile, tile+k]
    top-k concat intermediates plus the double-buffered blocks: 512×512
    costs ~10.5 MB f32; 512×1024 OOMs at 17.2 MB.  tile doesn't affect HBM
    traffic, so keep it at 512 and spend the budget on q_tile.
    """
    ls, d = source.shape
    lr = library.shape[0]
    assert lr >= k, f"library has {lr} rows < k={k}"
    tile = min(tile, max(512, 1 << (lr - 1).bit_length()))

    if valid_rows is not None:
        assert penalty is None, "valid_rows and penalty are exclusive"
        if precision == "default" and extraction == "auto":
            from alivevc_tpu.kernels.knn_twopass import knn_topk_twopass

            return knn_topk_twopass(source, library, k=k, tile=tile,
                                    q_tile=q_tile, valid_rows=valid_rows)
        # exact modes: express the suffix exclusion as a penalty column
        penalty = jnp.where(
            jnp.arange(lr) < valid_rows, 0.0, -10.0
        ).astype(jnp.float32)

    if extraction == "auto" and lr >= 4096:
        # Large libraries route to the two-pass kernels (knn_twopass.py):
        # parallel per-tile extraction + exact hierarchical merge.  Measured
        # at the bench shape (28.8k queries x 100k frames,
        # scripts/bench_knn_twopass.py): licensed bf16 packed 36.0 ms vs
        # 53.7 ms carried; the r5 EXACT two-pass covers 'high'/'highest'
        # and the penalty path (sharded retrieval) with ranking identical
        # to the carried kernel — no mode pays the sequential carry.
        # Small libraries (e.g. streaming's 512-row library) keep the
        # carried kernel: two kernel launches + an HBM candidate round
        # trip would dominate at that size.
        from alivevc_tpu.kernels.knn_twopass import knn_topk_twopass

        return knn_topk_twopass(source, library, k=k, tile=tile,
                                q_tile=q_tile, precision=precision,
                                penalty=penalty)

    def normalize(x):
        x = x.astype(jnp.float32)
        return x * jax.lax.rsqrt(
            jnp.maximum(jnp.sum(x * x, axis=1, keepdims=True), 1e-30)
        )

    src = normalize(source)
    library = normalize(library)
    if penalty is not None:
        src = jnp.concatenate([src, jnp.ones((ls, 1), src.dtype)], axis=1)
        library = jnp.concatenate(
            [library, penalty.astype(library.dtype)[:, None]], axis=1
        )
        d += 1
    if precision == "default":
        # bf16 operands halve VMEM + HBM traffic of the library stream and
        # run the MXU single-pass; the dot still accumulates in f32
        src = src.astype(jnp.bfloat16)
        library = library.astype(jnp.bfloat16)
    elif precision == "high":
        # Manual bf16x3: Mosaic rejects lax.Precision.HIGH, so widen the
        # operands instead — with x = hi + lo (hi = bf16(x), lo = bf16
        # residual), s·l ≈ s_hi·l_hi + s_hi·l_lo + s_lo·l_hi (the dropped
        # lo·lo term is O(2^-16) relative).  Concatenating [s_hi, s_hi,
        # s_lo] against [l_hi, l_lo, l_hi] computes exactly that sum in ONE
        # single-pass-bf16 dot over a 3x feature dim: 3 MXU passes total,
        # ~2x faster than the 6-pass HIGHEST emulation, scores f32-faithful
        # to ~1e-7.  (Penalty column, if any, was appended above, so its
        # hi+lo split rides along and sums back to the exact penalty.)
        def split(x):
            hi = x.astype(jnp.bfloat16)
            lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return hi, lo

        s_hi, s_lo = split(src)
        l_hi, l_lo = split(library)
        src = jnp.concatenate([s_hi, s_hi, s_lo], axis=1)
        library = jnp.concatenate([l_hi, l_lo, l_hi], axis=1)
        d *= 3

    q_tile = min(q_tile, -(-ls // 8) * 8)
    ls_pad = (-ls) % q_tile
    if ls_pad:
        src = jnp.pad(src, ((0, ls_pad), (0, 0)))
    lr_pad = (-lr) % tile
    if lr_pad:
        library = jnp.pad(library, ((0, lr_pad), (0, 0)))
    n_tiles = library.shape[0] // tile
    lsp = src.shape[0]
    n_qt = lsp // q_tile

    # 'highest' = 6-pass bf16 (exact fp32-faithful ranking, the parity
    # contract); 'high' = bf16x3 via the operand widening above (DEFAULT-
    # precision dot over the 3x feature dim); 'default' = single-pass bf16.
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    if extraction == "auto":
        # measured on-chip at the bench shape (scripts/bench_knn.py): the
        # packed-index extraction is 3.6x SLOWER than the exact masked
        # max/min extraction (189 vs 53 ms) — the [Ls, 128]-subtile loop
        # defeats Mosaic's lane vectorization.  'exact' everywhere.
        extraction = "exact"
    if (extraction == "packed" and precision == "default" and penalty is None
            and tile % 128 == 0 and k <= 8):
        # approximate mode: packed-index extraction (3 VPU passes/iter);
        # penalty-free only (scores must stay in [-1, 1] for the +2 shift)
        kern_fn = _knn_kernel_fast
    else:
        kern_fn = _knn_kernel
    kernel = functools.partial(kern_fn, k=k, tile=tile, lr=lr, precision=prec)
    vals, idx = pl.pallas_call(
        kernel,
        # library tiles iterate fastest (carry resets per query tile)
        grid=(n_qt, n_tiles),
        in_specs=[
            pl.BlockSpec((q_tile, d), lambda q, t: (q, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda q, t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q_tile, k), lambda q, t: (q, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, k), lambda q, t: (q, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((lsp, k), jnp.float32),
            jax.ShapeDtypeStruct((lsp, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((q_tile, 128), jnp.float32),
            pltpu.VMEM((q_tile, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(src, library)
    return vals[:ls], idx[:ls]


@functools.partial(jax.jit, static_argnames=("k", "tile", "precision"))
def match_features_pallas(
    source: jax.Array,     # [Ls, D]
    library: jax.Array,    # [Lr, D]
    k: int = 4,
    alpha: float = 0.0,
    tile: int = 512,
    precision: str = "highest",
) -> jax.Array:
    """match_features (unbatched) with the fused Pallas top-k."""
    _, idx = knn_topk_pallas(source, library, k=k, tile=tile, precision=precision)
    gathered = jax.lax.stop_gradient(library)[idx]       # [Ls, k, D]
    result = jnp.mean(gathered.astype(jnp.float32), axis=1)
    return result * (1.0 - alpha) + source * alpha


@functools.partial(jax.jit, static_argnames=("k", "tile", "precision"))
def match_features_pallas_batched(
    source: jax.Array,     # [N, Ls, D]
    library: jax.Array,    # [Lr, D]
    k: int = 4,
    alpha: float = 0.0,
    tile: int = 512,
    precision: str = "highest",
) -> jax.Array:
    """Batched match: queries from all windows fused into one kernel launch."""
    n, ls, d = source.shape
    flat = source.reshape(n * ls, d)
    out = match_features_pallas(
        flat, library, k=k, alpha=alpha, tile=tile, precision=precision
    )
    return out.reshape(n, ls, d)
