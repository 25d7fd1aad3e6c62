"""Pallas TPU kernel: fused DDSP harmonic source synthesis.

The XLA oscillator (models/decoder.py harmonic_oscillator) materializes five
[N, Lw, 64] tensors in HBM (interpolated formants, amplitudes, the phase
cumsum, sin, products) — ~75 MB per second of audio.  This kernel streams
time tiles and never touches HBM with sample-rate intermediates.

The phase integral has a *closed form*: the x320 linear upsampling of the
frame-rate formants means the instantaneous frequency inside segment q is a
fixed mix of frames (q-1, q, q+1) with per-sample weights (wa, wb, wc)
(torch align_corners=False; the clamped edges reduce to edge replication of
the padded frame arrays, fed as three shifted views so every BlockSpec tile
is disjoint).  Therefore the within-segment phase cumsum is the same mix with
*prefix-summed* weights (WA, WB, WC), the per-segment totals are the mix with
scalar total weights, and the per-segment base phases are a tiny [ft, ft]
strict-lower-triangular matmul on the MXU — no sequential scan anywhere.  A
carried phase row in VMEM scratch keeps accumulation exact across tiles (the
reference's ``dt - dt[:, :, 0]`` re-zeroing for crop=(0,-1) is a second
carried row).

Then sin, amplitude multiply, and the mean over 64 harmonics happen in VMEM
and only the [T_w] wave tile is written.  HBM traffic: frame-rate inputs +
the wave — ~65x less than the XLA path.  Used on the offline path (phi=0,
crop=(0,-1)); the streaming path keeps the XLA oscillator for its full
phi/crop semantics.

Reference semantics: module/decoder.py:66-102.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.lru_cache(maxsize=None)
def _interp_weights_np(seg: int):
    """Piecewise linear-interp weights and their inclusive prefix sums.

    Sample r of segment q mixes padded frames (q-1, q, q+1):
      value[q*seg+r] = F[q-1]*wa[r] + F[q]*wb[r] + F[q+1]*wc[r]
    """
    r = np.arange(seg)
    u = (r + 0.5) / seg - 0.5
    wa = np.where(u < 0, -u, 0.0)
    wb = np.where(u < 0, 1.0 + u, 1.0 - u)
    wc = np.where(u >= 0, u, 0.0)
    w = np.stack([wa, wb, wc]).astype(np.float32)          # [3, seg]
    wsum = np.cumsum(w, axis=1).astype(np.float32)         # [3, seg] prefix
    return w, wsum


def _osc_kernel(
    f0_ref, f1_ref, f2_ref, a0_ref, a1_ref, a2_ref, w_ref, ws_ref,
    out_ref, carry_scr, base_scr, *, ft: int, seg: int, nh: int
):
    """Working layout [ft, NH, SEG]: harmonics ride the sublanes (64 = eight
    exact 8-row tiles) and samples the lanes (320 → 3 lane tiles, ~83%
    utilization) — vs the naive [ft, seg, nh] layout whose 64-wide minor dim
    pads every vreg to 128 lanes (50% waste).  All frame→sample mixes become
    lane broadcasts, the harmonic mean a sublane reduction."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        carry_scr[:] = jnp.zeros_like(carry_scr)

    w = w_ref[:]                                           # [3, seg]
    ws = ws_ref[:]                                         # [3, seg] prefix sums

    def mix(x0, x1, x2, wts):
        acc = x0[0][:, :, None] * wts[0][None, None, :]
        acc += x1[0][:, :, None] * wts[1][None, None, :]
        acc += x2[0][:, :, None] * wts[2][None, None, :]
        return acc                                         # [ft, nh, seg]

    # within-segment inclusive phase cumsum (freq already scaled by 1/sr)
    cseg = mix(f0_ref[:], f1_ref[:], f2_ref[:], ws)        # [ft, nh, seg]
    totals = cseg[:, :, seg - 1]                           # [ft, nh]
    # exclusive prefix over the ft segments — unrolled fp32 VPU adds staged
    # through VMEM scratch rows (an MXU matmul here would run at bf16 and
    # wreck phases hundreds of cycles large; a jnp.concatenate of the
    # per-row vectors trips Mosaic's "offset mismatch on non-concat
    # dimension" because each unrolled row carries a different vreg offset)
    run = jnp.zeros((1, totals.shape[1]), jnp.float32)
    for q in range(ft):
        base_scr[q : q + 1, :] = run
        run = run + totals[q : q + 1, :]
    base = base_scr[:]                                     # [ft, nh]
    # carry scratch is [nh, 2] (harmonics on sublanes, matching phase's
    # layout): col 0 = running carry, col 1 = the t=0 re-zero reference —
    # no cross-layout transposes anywhere
    phase = cseg + base[:, :, None] + carry_scr[:, 0:1][None, :, :]

    @pl.when(t == 0)
    def _():
        # the reference re-zeroes at dt[0] (first sample's cumsum value)
        carry_scr[:, 1:2] = phase[0, :, 0:1]

    carry_scr[:, 0:1] = phase[ft - 1, :, seg - 1 : seg]

    amp = mix(a0_ref[:], a1_ref[:], a2_ref[:], w)
    theta = 2.0 * math.pi * (phase - carry_scr[:, 1:2][None, :, :])
    wave = jnp.sum(jnp.sin(theta) * amp, axis=1) / nh      # [ft, seg]
    out_ref[:] = wave[None]


def _osc_cheb_kernel(
    f0a_ref, f0b_ref, f0c_ref, a0_ref, a1_ref, a2_ref, w_ref, ws_ref,
    out_ref, carry_scr, *, ft: int, seg: int, nh: int
):
    """Chebyshev-recurrence variant: only the FUNDAMENTAL phase is mixed and
    prefix-summed; harmonic k's waveform comes from the second-order linear
    recurrence sin(kθ) = 2cos(θ)·sin((k−1)θ) − sin((k−2)θ).  Valid because the
    decoder's formants are exactly f0·k (module/decoder.py:84), interpolation
    and cumsum are linear, hence phase_k ≡ k·phase_1.  This replaces 64
    transcendental sin evaluations per sample with one sin + one cos + 2 FMAs
    per harmonic, and shrinks the phase-mix work ×64.

    Accuracy: the running inter-tile carry is wrapped mod 1 (phase held in
    cycles), and the per-frame base is wrapped before the sample mix, so θ
    stays ≤ ~10 cycles inside a tile.  sin(kθ) error then grows like
    k·ulp(θ) ≈ 4e-4 at k=64 — *better* than independent fp32 accumulation,
    whose harmonic-64 phase reaches ~1e5 cycles with ulp ≈ 1e-2 on long
    windows.
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        carry_scr[:] = jnp.zeros_like(carry_scr)

    w = w_ref[:]                                           # [3, seg]
    ws = ws_ref[:]                                         # [3, seg]

    # fundamental within-segment inclusive phase cumsum (freq pre-scaled 1/sr)
    fa, fb, fc = f0a_ref[0], f0b_ref[0], f0c_ref[0]        # [ft, 1] each
    cseg = (fa * ws[0:1, :] + fb * ws[1:2, :] + fc * ws[2:3, :])   # [ft, seg]
    totals = cseg[:, seg - 1 : seg]                        # [ft, 1]
    # exclusive prefix over the tile's frame totals as one strictly-lower-
    # triangular MXU matmul (a sequential ft-step scalar loop serializes the
    # kernel at large ft; HIGHEST keeps the f32 phase exact)
    ri = jax.lax.broadcasted_iota(jnp.int32, (ft, ft), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (ft, ft), 1)
    tri = (ci < ri).astype(jnp.float32)
    base = jax.lax.dot(tri, totals, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)  # [ft, 1]

    @pl.when(t == 0)
    def _():
        # reference phase the decoder re-zeroes against: dt at sample 0
        carry_scr[0:1, 1:2] = cseg[0:1, 0:1] + base[0:1, :]

    # wrap the per-frame offset mod 1 BEFORE the sample mix: sin(2πx) is
    # 1-periodic, and keeping x ≤ ~10 cycles preserves fp32 phase precision
    off = base + carry_scr[0:1, 0:1] - carry_scr[0:1, 1:2]   # [ft, 1]
    off = off - jnp.floor(off)
    new_carry = cseg[ft - 1 : ft, seg - 1 : seg] + base[ft - 1 : ft, :] \
        + carry_scr[0:1, 0:1]
    carry_scr[0:1, 0:1] = new_carry - jnp.floor(new_carry)

    theta = (2.0 * math.pi) * (cseg + off)                 # [ft, seg]
    s1 = jnp.sin(theta)
    twoc = 2.0 * jnp.cos(theta)

    amp = (
        a0_ref[0][:, :, None] * w[0][None, None, :]
        + a1_ref[0][:, :, None] * w[1][None, None, :]
        + a2_ref[0][:, :, None] * w[2][None, None, :]
    )                                                      # [ft, nh, seg]

    s_km2 = jnp.zeros_like(s1)                             # sin(0·θ)
    s_km1 = s1
    acc = s1 * amp[:, 0, :]
    for k in range(1, nh):
        s_k = twoc * s_km1 - s_km2
        acc = acc + s_k * amp[:, k, :]
        s_km2, s_km1 = s_km1, s_k
    out_ref[:] = (acc / nh)[None]


@functools.partial(jax.jit, static_argnames=("sample_rate", "frame_tile"))
def harmonic_source_cheb_pallas(
    f0: jax.Array,         # [N, Lf, 1] or [N, Lf] Hz (fundamental)
    amps: jax.Array,       # [N, Lf, NH]
    sample_rate: int = 16_000,
    frame_tile: int = 8,
) -> jax.Array:
    """Harmonic source via the Chebyshev sin(kθ) recurrence.

    → source wave [N, Lf*320, 1] (crop=(0,-1), phi=0 semantics); exactly the
    decoder's offline oscillator with formants = f0 · (1..NH)
    (module/decoder.py:66-102).
    """
    if f0.ndim == 3:
        f0 = f0[..., 0]
    n, lf = f0.shape
    nh = amps.shape[-1]
    seg = 320
    ft = min(frame_tile, lf)
    n_tiles = -(-lf // ft)

    pad_r = n_tiles * ft - lf + 1
    f = jnp.concatenate(
        [f0[:, :1], f0, jnp.repeat(f0[:, -1:], pad_r, axis=1)], axis=1
    ).astype(jnp.float32) / sample_rate
    a = jnp.concatenate(
        [amps[:, :1], amps, jnp.repeat(amps[:, -1:], pad_r, axis=1)], axis=1
    ).astype(jnp.float32)
    body = n_tiles * ft
    f = f[:, :, None]                                      # [N, body+2, 1]
    f0a, f0b, f0c = f[:, 0:body], f[:, 1 : body + 1], f[:, 2 : body + 2]
    a0, a1, a2 = a[:, 0:body], a[:, 1 : body + 1], a[:, 2 : body + 2]

    w_np, ws_np = _interp_weights_np(seg)

    f_spec = pl.BlockSpec((1, ft, 1), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM)
    a_spec = pl.BlockSpec((1, ft, nh), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM)
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda b, t: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(_osc_cheb_kernel, ft=ft, seg=seg, nh=nh)
    out = pl.pallas_call(
        kernel,
        grid=(n, n_tiles),
        in_specs=[f_spec] * 3 + [a_spec] * 3
        + [const_spec((3, seg)), const_spec((3, seg))],
        out_specs=pl.BlockSpec(
            (1, ft, seg), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, n_tiles * ft, seg), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, 2), jnp.float32),
        ],
    )(f0a, f0b, f0c, a0, a1, a2, jnp.asarray(w_np), jnp.asarray(ws_np))
    return out.reshape(n, n_tiles * ft * seg)[:, : lf * seg, None]


@functools.partial(jax.jit, static_argnames=("sample_rate", "frame_tile"))
def harmonic_source_pallas(
    formants: jax.Array,   # [N, Lf, 64] Hz (f0 * harmonic index)
    amps: jax.Array,       # [N, Lf, 64]
    sample_rate: int = 16_000,
    frame_tile: int = 8,
) -> jax.Array:
    """→ source wave [N, Lf*320, 1] (crop=(0,-1), phi=0 semantics)."""
    n, lf, nh = formants.shape
    seg = 320
    ft = min(frame_tile, lf)
    n_tiles = -(-lf // ft)

    # edge-replicate pad: 1 frame left, 1 + tile-remainder frames right
    pad_r = n_tiles * ft - lf + 1
    f = jnp.concatenate(
        [formants[:, :1], formants, jnp.repeat(formants[:, -1:], pad_r, axis=1)],
        axis=1,
    ).astype(jnp.float32) / sample_rate
    a = jnp.concatenate(
        [amps[:, :1], amps, jnp.repeat(amps[:, -1:], pad_r, axis=1)], axis=1
    ).astype(jnp.float32)
    body = n_tiles * ft
    # three shifted views → disjoint BlockSpec tiles despite frame overlap
    f0, f1, f2 = f[:, 0:body], f[:, 1 : body + 1], f[:, 2 : body + 2]
    a0, a1, a2 = a[:, 0:body], a[:, 1 : body + 1], a[:, 2 : body + 2]

    w_np, ws_np = _interp_weights_np(seg)

    tile_spec = pl.BlockSpec(
        (1, ft, nh), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
    )
    const_spec = lambda shape: pl.BlockSpec(
        shape, lambda b, t: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(_osc_kernel, ft=ft, seg=seg, nh=nh)
    out = pl.pallas_call(
        kernel,
        grid=(n, n_tiles),
        in_specs=[tile_spec] * 6
        + [const_spec((3, seg)), const_spec((3, seg))],
        out_specs=pl.BlockSpec(
            (1, ft, seg), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, n_tiles * ft, seg), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nh, 2), jnp.float32),
            pltpu.VMEM((ft, nh), jnp.float32),
        ],
    )(f0, f1, f2, a0, a1, a2, jnp.asarray(w_np), jnp.asarray(ws_np))
    return out.reshape(n, n_tiles * ft * seg)[:, : lf * seg, None]
