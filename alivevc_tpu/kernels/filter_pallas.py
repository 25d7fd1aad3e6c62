"""Pallas TPU kernel: fused Filter U-Net level (input conv + res-block stack).

The packed-layout XLA implementation (models/filter_packed.py) already turns
every causal conv of a level into lane-dense [*,W]@[W,W] matmuls, but each of
the ~13 ops per level (2 FiLM tensors + 1 conv per modulated conv, x 6 convs,
plus gelu/residual) round-trips the level tensor through HBM — measured
~177 ms of a 309 ms conversion step at the config-#3 bench shape, ~3% of MXU
peak (PERF.md).  This kernel runs one level's whole stack —

    input_conv -> 3 x [gelu -> FiLM -> causal conv -> gelu -> FiLM ->
                       causal conv -> +residual]

— on a VMEM-resident time tile: HBM traffic becomes ~2 reads + 1 write of the
level tensor (x is read twice for the halo ref) instead of ~26 passes.

Reference semantics: module/decoder.py:105-182 (ModulatedCausalConv1d /
FilterResBlock / FilterBlock).  Math parity vs models/filter_packed.py:
tests/test_filter_pallas.py.

Key constructions
-----------------
* **Packed layout**: a level with C channels (C<=128) rides as [N, B, W=128]
  with P = 128//C consecutive samples per row (models/filter_packed.py).
  C=256 rides as [N, B, 256] with P=1.
* **Causal convs** are sums of block-shifted matmuls y = sum_s x_{-s} @ M_s
  with M_s precomputed in XLA from the conv weight and the intra-block sample
  permutation (decoder._packed_matrices; zero shift-matrices are dropped).
  Shifts become static sublane slices of a zero-padded VMEM value.
* **Halo**: the stack's causal lookback is 2*(k-1)*sum(2^i) samples (56 for
  k=5, dilations 1/2/4) = HB packed rows.  Each grid step loads its tile plus
  the previous tile (same array passed twice with a shifted index map — the
  Mosaic way around overlapping BlockSpecs) and computes TB+HB rows; the
  first HB rows of the result are contaminated and discarded.  At t==0 the
  halo is zero-masked before every conv, reproducing the XLA bulk path's
  shift-in-zeros; the reflect-pad head (first HB rows of the window) is then
  recomputed exactly by the XLA packed path and stitched (causality makes a
  head-strip recompute exact).  (A round-3 experiment replaced the second x
  fetch with a VMEM scratch carry and lane-stacked the 12 FiLM tensors into
  one contiguous DMA: measured NO faster at any W=128 level and 2-10x longer
  Mosaic compiles, so the two-fetch layout stays.)
* **FiLM in-kernel**: scale/shift are tiny at frame rate ([N, F, C], r =
  samples per frame, P | r).  The kernel receives edge-padded frame rows
  (lane-tiled to W) and expands them to sample rate with the torch
  ``F.interpolate(mode='linear', align_corners=False)`` 3-tap periodic form:
  rep(frames, m)[j] three ways x three constant periodic per-lane weight
  tables (cf. filter_packed._film_consts), where m = r // P rows per frame.
  Frames tile with the grid via prev/cur/next refs (frame blocks align with
  time tiles because TB*P % r == 0).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alivevc_tpu.config import DecoderConfig
from alivevc_tpu.nn.layers import Params, linear
from alivevc_tpu.ops.interp import _upsample_weights_np


def _gelu_erf(x: jax.Array) -> jax.Array:
    """Exact-GELU with an in-kernel erf: Mosaic has no erf/erfc lowering, so
    use Abramowitz & Stegun 7.1.26 (|eps| <= 1.5e-7 absolute on erf, i.e.
    <= ~1e-7 * |x| on GELU — far below bf16 resolution and the fp32 parity
    tolerances).  Computed in f32 regardless of activation dtype (a bf16
    variant measured NO faster on-chip — v5e VPU element ops don't pack)."""
    xf = x.astype(jnp.float32) * np.float32(1.0 / math.sqrt(2.0))
    s = jnp.sign(xf)
    ax = jnp.abs(xf)
    t = 1.0 / (1.0 + np.float32(0.3275911) * ax)
    poly = ((((np.float32(1.061405429) * t + np.float32(-1.453152027)) * t
              + np.float32(1.421413741)) * t + np.float32(-0.284496736)) * t
            + np.float32(0.254829592)) * t
    erf = s * (1.0 - poly * jnp.exp(-ax * ax))
    return (0.5 * x.astype(jnp.float32) * (1.0 + erf)).astype(x.dtype)


# gelu(x) = x * (0.5 + clip(x) * R(clip(x)^2)): a degree-15 odd minimax fit of
# 0.5*erf(x/sqrt(2)) on |x| <= 4.5078 (1/sqrt(2) and the 0.5 folded into the
# coefficients).  Max |gelu err| 9.5e-4 absolute / 6.7e-4 relative — ~6x below
# bf16 resolution, so licensed for the bf16 activation path only; it replaces
# the A&S chain's sign/abs/div/exp (~25 VPU passes) with clip + 8 FMAs (~13).
_GELU_CLIP = np.float32(4.5078057300642405)
_GELU_COEF = tuple(
    np.float32(c) for c in (
        3.9863845314e-01, -6.5671862708e-02, 9.3210065302e-03,
        -9.4608653704e-04, 6.5250561431e-05, -2.8628399014e-06,
        7.1317955740e-08, -7.6285362297e-10,
    )
)


def _gelu_poly(x: jax.Array) -> jax.Array:
    xf = x.astype(jnp.float32)
    xc = jnp.clip(xf, -_GELU_CLIP, _GELU_CLIP)
    z2 = xc * xc
    r = _GELU_COEF[-1]
    for c in _GELU_COEF[-2::-1]:
        r = r * z2 + c
    return (xf * (np.float32(0.5) + xc * r)).astype(x.dtype)


def _gelu_for(dt) -> "callable":
    """bf16 activations take the cheap polynomial (error below bf16
    resolution); f32 keeps the A&S erf for the 5e-6 parity contract."""
    if "asgelu" in _ABLATE:
        return _gelu_erf
    return _gelu_poly if dt == jnp.bfloat16 else _gelu_erf


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------


def _stack_lookback_samples(k: int, n_blocks: int) -> int:
    return 2 * (k - 1) * sum(2 ** i for i in range(n_blocks))


def _choose_tb(b: int, p: int, r: int, w: int, hb: int,
               itemsize: int = 2) -> Tuple[int, int]:
    """Pick the time-tile TB (packed rows) and padded row count B_pad.

    Mosaic's on-chip lowering requires the second-to-last block dim be a
    multiple of 8 (sublanes) for both the level tensor tiles (TB) and the
    FiLM frame tiles (FTB = TB/m), so TB must be a multiple of 8*m where
    m = r/P rows per frame.  Such a TB rarely divides B at real shapes
    (e.g. B=4500, m=10 at level 3 of a 9 s window), so the wrapper instead
    zero-pads the time axis to B_pad = ceil(B/TB)*TB — causal convs make a
    trailing pad inert for every real row.  Among admissible tiles we pick
    the one minimizing waste = pad rows + halo recompute (nt*HB), tie-break
    larger (fewer grid steps).  Returns (0, 0) when unsupported."""
    if r % p:
        return 0, 0
    m = r // p
    step = 8 * m
    # VMEM budget: blocks (double-buffered) + the f32 value stack must fit
    # the 100 MB scope requested via CompilerParams (the f32 stack is ~16
    # [TBH,W] temps, the dominant term at large TB).
    #
    # W=128 levels are additionally capped near TB~1000: measured on-chip
    # (batch 64 bf16) their runtime is flat across TB in [320, 1600]
    # (level 0: 19.0-19.5 ms, level 1: 20.9-21.3 ms) while Mosaic compile
    # time explodes with TB (4-13 s at TB<=1600 vs >10 min at the old
    # waste-minimizing choice TB=3040).  W=256 keeps the large-tile search:
    # level 3 measured 2x FASTER at TB=1520 than at TB=960 (PERF.md).
    cap = (max(step, 1152) if w <= 128 else 2400) if itemsize <= 2 else (
        max(step, 1152) if w <= 128 else 1200)
    best, best_cost = (0, 0), None
    for tb in range(step, cap + 1, step):
        if tb <= hb or tb < 2 * m:     # halo must fit in one prev tile;
            continue                   # film slices need TB >= 2m
        nt = -(-b // tb)
        b_pad = nt * tb
        cost = (b_pad - b) + nt * hb
        if best_cost is None or cost < best_cost or (
            cost == best_cost and tb > best[0]
        ):
            best, best_cost = (tb, b_pad), cost
    return best


@functools.lru_cache(maxsize=None)
def _film_selectors(r: int, p: int, tbh: int, hb: int, ftb: int):
    """MXU-FiLM geometry: selector matrices turning the frame→row expansion
    into matmuls (film_impl='mxu').

    Row rr of a tile needs frames q, q+1, q+2 of the [3ftb] prev|cur|next
    frame window, q = (ftb*m - hb + rr)//m.  A 0/1 selector dot
    [TBH, KW] @ [KW, W] replaces the VPU path's broadcast ×m + reshape + two
    sublane-unaligned slices — a selector dot is *exact* in any matmul
    precision (one nonzero per row).  Columns are truncated to the used
    window [qmin, qmin+KW) to keep K one MXU chunk.

    Returns (qmin, kw, sel [3, TBH, KW] f32).
    """
    m = r // p
    q0 = np.arange(tbh, dtype=np.int64)
    q0 = (ftb * m - hb + q0) // m
    qmin = int(q0[0])
    qmax = int(q0[-1]) + 2
    kw = min(-(-(qmax - qmin + 1) // 8) * 8, 3 * ftb - qmin)
    sel = np.zeros((3, tbh, kw), np.float32)
    for s in range(3):
        cols = q0 + s - qmin
        assert cols.max() < kw, (r, p, tbh, hb, ftb, kw)
        sel[s, np.arange(tbh), cols] = 1.0
    return qmin, kw, sel


@functools.lru_cache(maxsize=None)
def _film_tables(r: int, p: int, tbh: int, hb: int, w: int) -> np.ndarray:
    """[3, TBH, W] periodic per-lane interp weights for rows -HB..TB-1 of a
    tile (row rr holds samples (rr-HB)*P .. +P-1 relative to the tile)."""
    wa, wb, wc = _upsample_weights_np(r)
    c = w // p if p >= 1 else w
    out = np.zeros((3, tbh, w), np.float32)
    for rr in range(tbh):
        for pp in range(p):
            u = ((rr - hb) * p + pp) % r
            out[0, rr, pp * c : (pp + 1) * c] = wa[u]
            out[1, rr, pp * c : (pp + 1) * c] = wb[u]
            out[2, rr, pp * c : (pp + 1) * c] = wc[u]
    return out


def _up_matrix(w3u: jax.Array, bu: jax.Array, p_in: int, p_out: int,
               r_up: int):
    """Fused-up-prologue geometry: one matmul matrix for the transposed
    rate conv that feeds a level (cf. filter_packed._packed_linear 'up').

    Form A (R = p_out/(r_up*p_in) >= 1): the caller presents the input as a
    lane-concat view [N, B_in/R, R*W_in] (a FREE reshape — row-major bytes
    are identical), and out[b] = view[b] @ upmat with
    upmat[delta*W_in:(delta+1)*W_in] = M_delta.  Rows are then 1:1 with the
    level's packed rows, so the level kernel's halo machinery applies
    unchanged.

    Form B (q = 1/R > 1): out rows come q-per-input-row:
    z = x_in @ upmat gives [B_in, q*W]; unfolding its lane blocks into rows
    ([A, q*W] -> [A*q, W], pure row-major) yields the packed level tensor.

    Returns (form, R_or_q, upmat, bias_row [W]).
    """
    from alivevc_tpu.models.filter_packed import _sel_op

    form, rq, sels = _sel_op("up", r_up, 0, p_in, p_out)
    cin, cout = w3u.shape[1], w3u.shape[2]
    w_in = p_in * cin
    if form == "A":
        by_delta = dict(sels)
        mats = []
        for delta in range(rq):
            sel = by_delta.get(delta)
            if sel is None:
                mats.append(jnp.zeros((w_in, p_out * cout), w3u.dtype))
            else:
                m = jnp.einsum("jqp,jio->qipo", jnp.asarray(sel), w3u)
                mats.append(m.reshape(w_in, p_out * cout).astype(w3u.dtype))
        upmat = jnp.concatenate(mats, axis=0)          # [R*W_in, W]
    else:
        ((delta0, sel),) = sels        # 'up' form B always has delta 0 only
        assert delta0 == 0
        m = jnp.einsum("jqs,jio->qiso", jnp.asarray(sel), w3u)
        upmat = m.reshape(w_in, rq * p_out * cout).astype(w3u.dtype)
    return form, rq, upmat, jnp.tile(bu, p_out)


def _shift_mats(w3: jax.Array, p: int, dilation: int):
    """Per-block-shift matmul matrices for a packed causal conv.

    Same construction as decoder._packed_matrices but drops all-zero shift
    matrices (for P=1 only k of the lookback+1 shifts are populated).
    Returns (shift offsets tuple, mats [n, W, W])."""
    k, c, _ = w3.shape
    lookback = (k - 1) * dilation
    n_prev = -(-lookback // p)
    sels = np.zeros((n_prev + 1, k, p, p), np.float32)
    for j in range(k):
        off = (k - 1 - j) * dilation
        for t_out in range(p):
            t_in = t_out - off
            s = 0
            while t_in < 0:
                t_in += p
                s += 1
            sels[s, j, t_in, t_out] = 1.0
    keep = tuple(s for s in range(n_prev + 1) if sels[s].any())
    sel = jnp.asarray(sels[list(keep)])
    mats = jnp.einsum("sjab,jio->saibo", sel, w3)
    return keep, mats.reshape(len(keep), p * c, p * c)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


# Trace-time ablation switch for on-chip attribution benchmarks ONLY
# (scripts/bench_fused_ablate.py): '' = production, 'nofilm' replaces the
# FiLM interp with a constant, 'nogelu' replaces gelu with identity.
# Ablated kernels compute the wrong function — never set outside a bench.
_ABLATE = ""

# Measured-per-geometry default for the FiLM expansion implementation
# ((W, P) -> 'vpu' | 'mxu' | 'mxu1').  On-chip A/B 2026-08-20 (batch 64
# bf16, scripts/bench_film_ab_all.py): level 0 (P=16) 22.98 vpu / 16.49 mxu
# / 17.86 mxu1; level 1 (P=8) 23.39 / 16.95 / 17.83; level 2 (P=2) 24.36 /
# 24.47 / 26.96 ms — per-use selector dots win 28% where the frame->row
# replication factor is large (P>=8); at P=2 the conv matmuls dominate and
# the film impl is a wash; W=256/P=1 (level 3) keeps vpu (m=10 and the
# level is near its MXU floor already).  mxu1's shared one-dot prologue
# loses to per-use mxu dots: the [TBH, 12W] carry adds VMEM pressure for
# no serial-op savings Mosaic couldn't already schedule.
_FILM_AUTO: dict = {(128, 16): "mxu", (128, 8): "mxu"}


def _stack_kernel(
    xp_ref, xc_ref, *refs,
    hb: int, tb: int, m: int, ftb: int, n_res: int,
    conv_offs, conv_mat0, precision, film_impl: str = "vpu", qmin: int = 0,
    up_form: str | None = None, upq: int = 1,
    packc: bool = False, nm: int = 0, kwsel: int = 0,
):
    if packc:
        # operand-collapse mode: conv mats + FiLM tables (+ mxu selectors)
        # arrive as ONE packed constant buffer with static row slices —
        # fewer per-grid-step operand streams for the Mosaic pipeline
        if up_form:
            (sp_ref, sc_ref, fp_ref, fc_ref, fn_ref, const_ref, bias_ref,
             upmat_ref, *rest) = refs
        else:
            fp_ref, fc_ref, fn_ref, const_ref, bias_ref, *rest = refs
        (out_ref,) = rest
    elif up_form:
        (sp_ref, sc_ref, fp_ref, fc_ref, fn_ref, wabc_ref, mats_ref,
         bias_ref, upmat_ref, *rest) = refs
    else:
        fp_ref, fc_ref, fn_ref, wabc_ref, mats_ref, bias_ref, *rest = refs
    if not packc:
        if film_impl in ("mxu", "mxu1", "mxu2"):
            rsel_ref, out_ref = rest
        else:
            (out_ref,) = rest
    w = out_ref.shape[-1]
    tbh = hb + tb
    t = pl.program_id(1)
    dt = xc_ref.dtype

    if packc:
        def _mat(i):
            return const_ref[i * w : (i + 1) * w]

        _wb0 = nm * w

        def _wabc(s):
            return const_ref[_wb0 + s * tbh : _wb0 + (s + 1) * tbh]

        _sel0 = _wb0 + 3 * tbh

        def _rsel(s):
            return const_ref[_sel0 + s * tbh : _sel0 + (s + 1) * tbh, :kwsel]

        _kw = kwsel
    else:
        def _mat(i):
            return mats_ref[i]

        def _wabc(s):
            return wabc_ref[s]

        def _rsel(s):
            return rsel_ref[s]

        _kw = rsel_ref.shape[-1] if film_impl in ("mxu", "mxu1", "mxu2") else 0

    if up_form == "A":
        # fused up-conv prologue: xp/xc (and sp/sc) are lane-concat VIEWS of
        # the previous level's packed tensor (rows 1:1 with this level's);
        # one matmul applies the whole transposed rate conv + skip add
        xin = jnp.concatenate([xp_ref[0][tb - hb :], xc_ref[0]], axis=0)
        sin = jnp.concatenate([sp_ref[0][tb - hb :], sc_ref[0]], axis=0)
        zin = lax.dot(xin + sin, upmat_ref[:].astype(dt),
                      preferred_element_type=jnp.float32, precision=precision)
        xh = (zin + bias_ref[1 + 2 * n_res].astype(jnp.float32)).astype(dt)
    elif up_form == "B":
        # q output rows per input row: z holds them as lane blocks; the
        # [A, q*W] -> [A*q, W] reshape is a pure row-major unfold
        tbi, hbi = tb // upq, hb // upq
        xin = jnp.concatenate([xp_ref[0][tbi - hbi :], xc_ref[0]], axis=0)
        sin = jnp.concatenate([sp_ref[0][tbi - hbi :], sc_ref[0]], axis=0)
        z = lax.dot(xin + sin, upmat_ref[:].astype(dt),
                    preferred_element_type=jnp.float32, precision=precision)
        z = z.reshape(tbh, w)
        xh = (z + bias_ref[1 + 2 * n_res].astype(jnp.float32)).astype(dt)
    else:
        xh = jnp.concatenate([xp_ref[0][tb - hb :], xc_ref[0]], axis=0)  # [TBH, W]
    first = t == 0
    halo = lax.broadcasted_iota(jnp.int32, (tbh, 1), 0) < hb

    def zmask(v):
        if "nozmask" in _ABLATE:
            return v
        return jnp.where(jnp.logical_and(first, halo), jnp.zeros_like(v), v)

    # bf16 activations keep the FiLM interpolation in bf16 end-to-end (the
    # weight tables arrive in dt): saves the f32 casts — the interp error is
    # one bf16 rounding, absorbed by the bf16 path's tolerance.  f32 keeps
    # f32 math for the 5e-6 parity contract.
    ft = dt if dt == jnp.bfloat16 else jnp.float32
    wa = _wabc(0).astype(ft)
    wb = _wabc(1).astype(ft)
    wc = _wabc(2).astype(ft)
    off0 = ftb * m - hb

    if film_impl == "mxu1":
        # One selector-dot set expands ALL 4*n_res FiLM tensors at once: the
        # frame rows arrive lane-stacked [ftb, 12W], three dots [TBH, KW] @
        # [KW, 12W] pick frames q/q+1/q+2 per row (exact — one nonzero per
        # selector row), and the periodic weight tables (pre-tiled to 12W)
        # finish the interp in 3 wide VPU passes.  Each film(idx) use is
        # then a lane-aligned slice — the serial per-use cost of the VPU
        # path (broadcast x m + reshape + two sublane-unaligned slices,
        # x12 uses) collapses to one shared 6-op prologue.
        few = jnp.concatenate([fp_ref[0], fc_ref[0], fn_ref[0]], axis=0)
        kw = _kw
        w12 = few.shape[-1]
        rows_win = lax.slice(few, (qmin, 0), (qmin + kw, w12)).astype(dt)
        s0 = lax.dot(_rsel(0).astype(dt), rows_win,
                     preferred_element_type=jnp.float32)
        s1 = lax.dot(_rsel(1).astype(dt), rows_win,
                     preferred_element_type=jnp.float32)
        s2 = lax.dot(_rsel(2).astype(dt), rows_win,
                     preferred_element_type=jnp.float32)
        films_all = (s0.astype(ft) * wa + s1.astype(ft) * wb
                     + s2.astype(ft) * wc).astype(dt)       # [TBH, 12W]

        def film(idx):
            return lax.slice(films_all, (0, idx * w), (tbh, (idx + 1) * w))

    elif film_impl == "mxu2":
        # hybrid: the contiguous [ftb, 12W] fe layout (one 147 KB DMA per
        # block instead of 12 strided 12 KB sub-blocks — the skeleton's
        # prime suspect) + mxu's per-use selector dots.  Each film(idx)
        # lane-slices its [3ftb, W] frame window (128-aligned, cheap) and
        # expands with 3 exact selector dots.
        few2 = jnp.concatenate([fp_ref[0], fc_ref[0], fn_ref[0]], axis=0)
        kw2 = _kw

        def film(idx):
            rows_win = lax.slice(
                few2, (qmin, idx * w), (qmin + kw2, (idx + 1) * w)
            ).astype(dt)
            s0 = lax.dot(_rsel(0).astype(dt), rows_win,
                         preferred_element_type=jnp.float32)
            s1 = lax.dot(_rsel(1).astype(dt), rows_win,
                         preferred_element_type=jnp.float32)
            s2 = lax.dot(_rsel(2).astype(dt), rows_win,
                         preferred_element_type=jnp.float32)
            return (s0.astype(ft) * wa + s1.astype(ft) * wb
                    + s2.astype(ft) * wc).astype(dt)

    else:
        fe = jnp.concatenate([fp_ref[0], fc_ref[0], fn_ref[0]], axis=1)

    def _film_legacy(idx):
        if "nofilm" in _ABLATE:
            # [1, W] -> [TBH, W] is a sublane-only broadcast (Mosaic-legal)
            return jnp.broadcast_to(fe[idx][:1].astype(dt), (tbh, w))
        if film_impl == "mxu":
            # selector matmuls: rows_win [KW, W] holds the used frame window;
            # each dot picks one frame per output row (exact — one nonzero
            # per selector row), replacing the broadcast x m + reshape + two
            # sublane-unaligned slices of the VPU path with 3 MXU passes.
            kw = _kw
            rows_win = lax.slice(fe[idx], (qmin, 0), (qmin + kw, w)).astype(dt)
            s0 = lax.dot(_rsel(0).astype(dt), rows_win,
                         preferred_element_type=jnp.float32)
            s1 = lax.dot(_rsel(1).astype(dt), rows_win,
                         preferred_element_type=jnp.float32)
            s2 = lax.dot(_rsel(2).astype(dt), rows_win,
                         preferred_element_type=jnp.float32)
            return (s0.astype(ft) * wa + s1.astype(ft) * wb
                    + s2.astype(ft) * wc).astype(dt)
        rows = fe[idx].astype(ft)                                # [3ftb, W]
        rep = jnp.broadcast_to(rows[:, None, :], (3 * ftb, m, w))
        rep = rep.reshape(3 * ftb * m, w)
        s0 = lax.slice(rep, (off0, 0), (off0 + tbh, w))
        s1 = lax.slice(rep, (off0 + m, 0), (off0 + m + tbh, w))
        s2 = lax.slice(rep, (off0 + 2 * m, 0), (off0 + 2 * m + tbh, w))
        return (s0 * wa + s1 * wb + s2 * wc).astype(dt)

    if film_impl not in ("mxu1", "mxu2"):
        film = _film_legacy

    gelu_fn = (lambda v: v) if "nogelu" in _ABLATE else _gelu_for(dt)

    def conv(v, ci):
        if "noconv" in _ABLATE:
            return v + bias_ref[ci].astype(dt)
        offs = conv_offs[ci]
        smax = max(offs)
        vp = jnp.pad(v, ((smax, 0), (0, 0))) if smax else v
        acc = None
        for i, s in enumerate(offs):
            seg = lax.slice(vp, (smax - s, 0), (smax - s + tbh, w)) if smax else v
            term = lax.dot(
                seg, _mat(conv_mat0[ci] + i).astype(dt),
                preferred_element_type=jnp.float32, precision=precision,
            )
            acc = term if acc is None else acc + term
        return (acc + bias_ref[ci].astype(jnp.float32)).astype(dt)

    x = conv(zmask(xh), 0)                                        # input 1x1
    for i in range(n_res):
        res = x
        h = gelu_fn(x)
        h = zmask(h * film(4 * i) + film(4 * i + 1))
        h = conv(h, 1 + 2 * i)
        h = gelu_fn(h)
        h = zmask(h * film(4 * i + 2) + film(4 * i + 3))
        h = conv(h, 2 + 2 * i)
        x = res + h
    out_ref[0] = x[hb:]


# ---------------------------------------------------------------------------
# wrapper
# ---------------------------------------------------------------------------


def fused_supported(b: int, p: int, c: int, r: int, f: int,
                    k: int = 5, n_res: int = 3, itemsize: int = 2) -> bool:
    w = p * c
    if w not in (128, 256) or r % max(p, 1):
        return False
    hb = -(-_stack_lookback_samples(k, n_res) // p)
    tb, _ = _choose_tb(b, p, r, w, hb, itemsize)
    if not tb:
        return False
    ftb = tb * p // r
    return tb > hb and ftb >= 1 and hb < b


def _fused_impl(
    blk: Params,
    x: jax.Array | None,   # [N, B, W] packed level tensor (None when `up`)
    cond: jax.Array,       # [N, F, C_cond] frame-rate conditioning
    p: int,                # samples per packed row
    c: int,                # logical channels
    r: int,                # samples per frame at this level
    k: int = 5,
    precision: str = "default",
    tb_override: int = 0,
    film_impl: str = "auto",
    up=None,               # (w3u, bu, p_in, r_up, x_prev, skip) or None
) -> jax.Array:
    """models.filter_packed._filter_block_packed, fused into one Pallas
    program per (window, time tile).  Exact up to float summation order; the
    reflect-pad head (first HB rows) is recomputed by the XLA packed path.

    film_impl: 'vpu' (broadcast/slice expansion), 'mxu' (selector matmuls,
    _film_selectors), or 'auto' (measured-per-level choice).

    up: when given, the level's input is computed IN-KERNEL from the
    previous level's packed tensor: x = up_conv(x_prev + skip) — the U-Net
    up path's transposed rate conv, skip add, and inter-level relayout all
    fold into the level kernel's prologue (cf. reference
    module/decoder.py:148-158 up path; r5 glue fusion)."""
    from alivevc_tpu.models.filter_packed import (
        _filter_block_packed,
        _packed_linear,
    )

    w = p * c if c <= 128 else c
    up_form, upq, upmat, up_bias = None, 1, None, None
    if up is not None:
        w3u, bu, p_in, r_up, x_prev, skip = up
        n, b_in, w_in = x_prev.shape
        up_form, upq, upmat, up_bias = _up_matrix(w3u, bu, p_in, p, r_up)
        b = b_in // upq if up_form == "A" else b_in * upq
        dt = x_prev.dtype
    else:
        n, b, w = x.shape
        dt = x.dtype
    f = cond.shape[1]
    n_res = len(blk["blocks"])

    hb = -(-_stack_lookback_samples(k, n_res) // p)
    if up_form == "B":
        hb = upq * (-(-hb // upq))     # input-halo alignment: q | hb
    if tb_override:
        tb, b_pad = tb_override, -(-b // tb_override) * tb_override
    else:
        tb, b_pad = _choose_tb(b, p, r, w, hb, jnp.dtype(dt).itemsize)
    if up_form == "B":
        # input tiles are tb/q rows and must stay sublane-aligned — the
        # dispatch gate (fused_up_supported) guarantees this; assert so a
        # direct caller with a bad tb_override fails loudly
        assert tb % upq == 0 and (tb // upq) % 8 == 0, (tb, upq)
    nt = b_pad // tb
    if up is None and b_pad > b:
        x = jnp.pad(x, ((0, 0), (0, b_pad - b), (0, 0)))
    ftb = tb * p // r
    m = r // p
    tbh = tb + hb

    # ---- XLA-side precompute (all tiny) ---------------------------------
    # FiLM frame rows: per res block i, conv c1/c2: scale (=linear+1) and
    # shift at frame rate, lane-tiled to W, edge-padded, padded to (nt+1)*ftb
    fes = []
    for i in range(n_res):
        for cc in ("c1", "c2"):
            pp = blk["blocks"][i][cc]
            fes.append(linear(pp["to_scale"], cond) + 1.0)
            fes.append(linear(pp["to_shift"], cond))
    if film_impl == "auto":
        film_impl = _FILM_AUTO.get((w, p), "vpu")
    tail = (nt + 1) * ftb - (f + 1)
    if film_impl in ("mxu1", "mxu2"):
        # lane-stacked layout [N, F_pad, 12W] — all 12 FiLM frame tensors
        # side by side so the kernel expands them with one selector-dot set
        fe = jnp.concatenate([jnp.tile(v, (1, 1, p)) for v in fes], axis=2)
        fe = jnp.concatenate([fe[:, :1], fe], axis=1)              # front edge
        fe = jnp.concatenate(
            [fe, jnp.broadcast_to(fe[:, -1:], (n, tail, 4 * n_res * w))], axis=1
        ).astype(dt)
    else:
        fe = jnp.stack([jnp.tile(v, (1, 1, p)) for v in fes], axis=1)  # [N,12,F,W]
        fe = jnp.concatenate([fe[:, :, :1], fe], axis=2)           # front edge
        fe = jnp.concatenate(
            [fe] + [jnp.broadcast_to(fe[:, :, -1:], (n, 4 * n_res, tail, w))],
            axis=2,
        ).astype(dt)

    # conv shift matrices: input 1x1 + 6 causal convs
    eye = np.eye(p, dtype=np.float32)
    wi = blk["input_conv"]["w"]
    mi = jnp.einsum("pq,io->piqo", jnp.asarray(eye), wi).reshape(w, w)
    mats_list = [mi[None]]
    conv_offs = [(0,)]
    conv_mat0 = [0]
    biases = [jnp.tile(blk["input_conv"]["b"], p)]
    nm = 1
    for i in range(n_res):
        for cc in ("c1", "c2"):
            conv_p = blk["blocks"][i][cc]["conv"]
            offs, mats = _shift_mats(conv_p["w"], p, 2 ** i)
            conv_offs.append(offs)
            conv_mat0.append(nm)
            nm += len(offs)
            mats_list.append(mats)
            biases.append(jnp.tile(conv_p["b"], p))
    mats_all = jnp.concatenate(mats_list, axis=0).astype(dt)       # [NM, W, W]
    if up is not None:
        biases.append(up_bias)          # row 1+2*n_res: fused up-conv bias
    bias_all = jnp.stack(biases).astype(jnp.float32)               # [7(+1), W]
    wabc = jnp.asarray(_film_tables(r, p, tbh, hb, w))             # [3,TBH,W]
    if film_impl == "mxu1":
        wabc = jnp.tile(wabc, (1, 1, 4 * n_res))                   # [3,TBH,12W]
    wabc = wabc.astype(dt)                  # mxu2 keeps the [3,TBH,W] table

    prec = (lax.Precision.HIGHEST if precision == "highest"
            else lax.Precision.DEFAULT)
    # operand collapse (r5): fold conv mats + FiLM tables (+ selectors) into
    # ONE [rows, W] constant buffer with static in-kernel row slices — cuts
    # the per-grid-step operand-stream count the Mosaic pipeline must issue.
    packc = (os.environ.get("ALIVEVC_PACKC", "0") == "1"
             and film_impl in ("vpu", "mxu"))
    qmin = 0
    kwsel = 0
    extra_ops, extra_specs = [], []
    sel = None
    if film_impl in ("mxu", "mxu1", "mxu2"):
        qmin, kw, sel = _film_selectors(r, p, tbh, hb, ftb)
        kwsel = kw
        if packc and kw > w:
            packc = False          # selector wider than a lane tile: keep
        if not packc:              # the separate [3, tbh, kw] operand
            extra_ops.append(jnp.asarray(sel).astype(dt))
            extra_specs.append(
                pl.BlockSpec((3, tbh, kw), lambda q, t: (0, 0, 0),
                             memory_space=pltpu.VMEM)
            )
    nm = mats_all.shape[0]
    if packc:
        rows = [mats_all.reshape(nm * w, w), wabc.reshape(3 * tbh, w)]
        if film_impl == "mxu":
            selp = np.pad(sel, ((0, 0), (0, 0), (0, w - kwsel)))
            rows.append(jnp.asarray(selp).astype(dt).reshape(3 * tbh, w))
        const_all = jnp.concatenate(rows, axis=0)
    kernel = functools.partial(
        _stack_kernel, hb=hb, tb=tb, m=m, ftb=ftb, n_res=n_res,
        conv_offs=tuple(conv_offs), conv_mat0=tuple(conv_mat0), precision=prec,
        film_impl=film_impl, qmin=qmin, up_form=up_form, upq=upq,
        packc=packc, nm=nm, kwsel=kwsel,
    )
    if up is None:
        lead_ops = (x, x)
        lead_specs = [
            pl.BlockSpec((1, tb, w), lambda q, t: (q, jnp.maximum(t - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb, w), lambda q, t: (q, t, 0),
                         memory_space=pltpu.VMEM),
        ]
        up_ops, up_specs = (), []
    else:
        if up_form == "A":
            # lane-concat view: [N, B_in, W_in] -> [N, B_in/R, R*W_in] is a
            # pure row-major reinterpretation (same bytes); rows become 1:1
            # with this level's packed rows
            xv = x_prev.reshape(n, b_in // upq, upq * w_in)
            sv = skip.reshape(n, b_in // upq, upq * w_in)
            tbv, wv = tb, upq * w_in
        else:
            xv, sv = x_prev, skip
            tbv, wv = tb // upq, w_in
        rows_pad = nt * tbv
        if rows_pad > xv.shape[1]:
            padr = rows_pad - xv.shape[1]
            xv = jnp.pad(xv, ((0, 0), (0, padr), (0, 0)))
            sv = jnp.pad(sv, ((0, 0), (0, padr), (0, 0)))
        lead_ops = (xv, xv, sv, sv)
        lead_specs = [
            pl.BlockSpec((1, tbv, wv), lambda q, t: (q, jnp.maximum(t - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tbv, wv), lambda q, t: (q, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tbv, wv), lambda q, t: (q, jnp.maximum(t - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tbv, wv), lambda q, t: (q, t, 0),
                         memory_space=pltpu.VMEM),
        ]
        up_ops = (upmat.astype(dt),)
        up_specs = [
            pl.BlockSpec(upmat.shape, lambda q, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    if film_impl in ("mxu1", "mxu2"):
        fe_specs = [
            pl.BlockSpec((1, ftb, 4 * n_res * w),
                         lambda q, t: (q, jnp.maximum(t - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ftb, 4 * n_res * w),
                         lambda q, t: (q, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ftb, 4 * n_res * w),
                         lambda q, t: (q, t + 1, 0),
                         memory_space=pltpu.VMEM),
        ]
        wabc_spec = pl.BlockSpec(
            (3, tbh, 4 * n_res * w if film_impl == "mxu1" else w),
            lambda q, t: (0, 0, 0), memory_space=pltpu.VMEM)
    else:
        fe_specs = [
            pl.BlockSpec((1, 4 * n_res, ftb, w),
                         lambda q, t: (q, 0, jnp.maximum(t - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * n_res, ftb, w),
                         lambda q, t: (q, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * n_res, ftb, w),
                         lambda q, t: (q, 0, t + 1, 0),
                         memory_space=pltpu.VMEM),
        ]
        wabc_spec = pl.BlockSpec((3, tbh, w), lambda q, t: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
    if packc:
        const_ops = (const_all,)
        const_specs = [
            pl.BlockSpec(const_all.shape, lambda q, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        const_ops = (wabc, mats_all)
        const_specs = [
            wabc_spec,
            pl.BlockSpec(mats_all.shape, lambda q, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    out = pl.pallas_call(
        kernel,
        grid=(n, nt),
        in_specs=[
            *lead_specs,
            *fe_specs,
            *const_specs,
            pl.BlockSpec(bias_all.shape, lambda q, t: (0, 0),
                         memory_space=pltpu.VMEM),
            *up_specs,
            *extra_specs,
        ],
        out_specs=pl.BlockSpec((1, tb, w), lambda q, t: (q, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, b_pad, w), dt),
        # blocks + double buffering + the f32 value stack exceed the 16 MB
        # default scoped-vmem limit at the large-tile geometries (observed
        # 16.63 MB at W=256/TB=960 inside the e2e program); v5e has 128 MB
        # physical VMEM, so raise the scope rather than shrink the tile.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*lead_ops, fe, fe, fe, *const_ops, bias_all, *up_ops, *extra_ops)

    # reflect-pad head: the kernel's zero-pad bulk differs from the reference
    # for the first HB rows; recompute them exactly (causal => a head strip
    # through the XLA packed path is exact for every row it covers).  Stitch
    # with dynamic_update_slice — XLA updates the dead `out` buffer in place,
    # where a concatenate would write a fresh full-size level tensor
    # (147-295 MB at the bench shape) just to replace HB rows.
    if os.environ.get("ALIVEVC_NOHEAD") == "1":
        # bench-only ablation: skip the reflect-pad head recompute + stitch
        # (WRONG function for the first HB rows — attribution probes only)
        return out[:, :b]
    if up is None:
        head_in = x[:, :hb]
    else:
        s_in = upq * hb if up_form == "A" else hb // upq
        head_in = _packed_linear(
            x_prev[:, :s_in] + skip[:, :s_in], w3u, bu, "up", r_up, 0,
            p_in, p, hb,
        ).astype(dt)
    head = _filter_block_packed(blk, head_in, cond, p, c, r, hb)
    out = lax.dynamic_update_slice(out, head.astype(dt), (0, 0, 0))
    return out[:, :b]


# ---------------------------------------------------------------------------
# autodiff: Pallas forward, packed-XLA backward
# ---------------------------------------------------------------------------
#
# pallas_call has no VJP, but the fused kernel computes the exact same
# function as _filter_block_packed (up to summation order), so the training
# path differentiates the packed XLA implementation while keeping the fused
# forward.  Backward cost = one packed forward (for residual linearization)
# + its transpose, same as plain AD of the packed path.


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6))
def _fused_cvjp(p, c, r, k, precision, tb_override, film_impl, blk, x, cond):
    return _fused_impl(blk, x, cond, p, c, r, k, precision, tb_override,
                       film_impl)


def _fused_cvjp_fwd(p, c, r, k, precision, tb_override, film_impl, blk, x, cond):
    out = _fused_cvjp(p, c, r, k, precision, tb_override, film_impl, blk, x, cond)
    return out, (blk, x, cond)


def _fused_cvjp_bwd(p, c, r, k, precision, tb_override, film_impl, res, g):
    from alivevc_tpu.models.filter_packed import _filter_block_packed

    blk, x, cond = res
    _, vjp = jax.vjp(
        lambda b_, x_, c_: _filter_block_packed(b_, x_, c_, p, c, r, x.shape[1]),
        blk, x, cond,
    )
    return vjp(g)


_fused_cvjp.defvjp(_fused_cvjp_fwd, _fused_cvjp_bwd)


def fused_filter_block(
    blk: Params,
    x: jax.Array,
    cond: jax.Array,
    p: int,
    c: int,
    r: int,
    k: int = 5,
    precision: str = "default",
    tb_override: int = 0,
    film_impl: str = "auto",
) -> jax.Array:
    return _fused_cvjp(p, c, r, k, precision, tb_override, film_impl, blk, x, cond)


# ---- fused up-conv prologue variant (r5 glue fusion) ----------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6, 7, 8))
def _fused_up_cvjp(p_in, p, c, r, r_up, k, precision, tb_override, film_impl,
                   blk, w3u, bu, x_prev, skip, cond):
    return _fused_impl(blk, None, cond, p, c, r, k, precision, tb_override,
                       film_impl, up=(w3u, bu, p_in, r_up, x_prev, skip))


def _fused_up_cvjp_fwd(p_in, p, c, r, r_up, k, precision, tb_override,
                       film_impl, blk, w3u, bu, x_prev, skip, cond):
    out = _fused_up_cvjp(p_in, p, c, r, r_up, k, precision, tb_override,
                         film_impl, blk, w3u, bu, x_prev, skip, cond)
    return out, (blk, w3u, bu, x_prev, skip, cond)


def _fused_up_cvjp_bwd(p_in, p, c, r, r_up, k, precision, tb_override,
                       film_impl, res, g):
    from alivevc_tpu.models.filter_packed import (
        _filter_block_packed,
        _packed_linear,
        _sel_op,
    )

    blk, w3u, bu, x_prev, skip, cond = res
    form, rq, _ = _sel_op("up", r_up, 0, p_in, p)
    b_out = x_prev.shape[1] // rq if form == "A" else x_prev.shape[1] * rq

    def f(blk_, w3u_, bu_, xp_, sk_, c_):
        xup = _packed_linear(xp_ + sk_, w3u_, bu_, "up", r_up, 0, p_in, p,
                             b_out)
        return _filter_block_packed(blk_, xup, c_, p, c, r, b_out)

    _, vjp = jax.vjp(f, blk, w3u, bu, x_prev, skip, cond)
    return vjp(g)


_fused_up_cvjp.defvjp(_fused_up_cvjp_fwd, _fused_up_cvjp_bwd)


def fused_filter_block_up(
    blk: Params,
    w3u: jax.Array,        # [r_up, C_in, C] transposed-conv weight
    bu: jax.Array,         # [C]
    x_prev: jax.Array,     # [N, B_in, W_in] previous level's packed tensor
    skip: jax.Array,       # [N, B_in, W_in] down-path skip (added pre-up)
    cond: jax.Array,
    p_in: int,
    p: int,
    c: int,
    r: int,
    r_up: int,
    k: int = 5,
    precision: str = "default",
    tb_override: int = 0,
    film_impl: str = "auto",
) -> jax.Array:
    """Level kernel with the U-Net up path fused in: computes
    filter_block(up_conv(x_prev + skip)) in one Pallas program — the
    transposed rate conv, skip add, and inter-level relayout never touch
    HBM (reference semantics: module/decoder.py:148-158 + 122-146)."""
    return _fused_up_cvjp(p_in, p, c, r, r_up, k, precision, tb_override,
                          film_impl, blk, w3u, bu, x_prev, skip, cond)


def fused_up_supported(b_in: int, p_in: int, c_in: int, p: int, c: int,
                       r: int, f: int, r_up: int, k: int = 5,
                       n_res: int = 3, itemsize: int = 2) -> bool:
    """Geometry check for the fused-up path (analog of fused_supported)."""
    from alivevc_tpu.models.filter_packed import _sel_op

    w = p * c if c <= 128 else c
    if w not in (128, 256) or r % max(p, 1):
        return False
    try:
        form, rq, _ = _sel_op("up", r_up, 0, p_in, p)
    except (ValueError, AssertionError):
        return False
    if form == "A":
        if b_in % rq:
            return False
        b = b_in // rq
    else:
        b = b_in * rq
    hb = -(-_stack_lookback_samples(k, n_res) // p)
    if form == "B":
        hb = rq * (-(-hb // rq))
    tb, _ = _choose_tb(b, p, r, w, hb, itemsize)
    if not tb:
        return False
    if form == "B" and (tb % rq or (tb // rq) % 8 or (hb // rq) >= tb // rq):
        return False
    s_in = rq * hb if form == "A" else hb // rq
    if s_in > b_in:
        return False
    ftb = tb * p // r
    return tb > hb and ftb >= 1 and hb < b
