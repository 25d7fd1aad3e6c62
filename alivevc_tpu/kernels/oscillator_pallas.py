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
