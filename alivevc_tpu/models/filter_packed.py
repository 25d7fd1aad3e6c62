"""Lane-dense packed-layout implementation of the Filter U-Net.

The reference U-Net (module/decoder.py:122-195) runs most of its sample-rate
convolutions at 8/16/64 channels.  In the natural channels-last layout
[N, L, C] every such tensor occupies 128 lanes on TPU regardless of C, so HBM
traffic and VPU work are up to 16x the logical size — profiling showed the
filter at ~65% of the whole conversion step.

This module keeps each level *permanently* packed as [N, B, P*C] with
P = 128 // C consecutive timesteps sharing the 128-lane dimension
(lane l = p*C + c, sample t = b*P + p).  Everything then becomes lane-dense:

  * causal convs  -> a few shifted [*,128]@[128,128] matmuls (exact reflect-pad
    head fix-up on the first blocks);
  * rate-changing convs (stride=kernel) and the stride-1 wave in/out convs
    -> one generic selector compiler emits per-phase matmuls, either
    "form A" (R >= 1 input blocks per output block: strided block views) or
    "form B" (q output blocks per input block: lane-concat matmul + a
    lane->sublane split reshape);
  * FiLM scale/shift -> computed at frame rate, upsampled straight into the
    packed layout with periodic per-phase weight vectors (torch
    F.interpolate(mode='linear') semantics, matching ops/interp.py);
  * GELU / residual adds -> elementwise on full lanes.

The 256-channel level runs through the same machinery with P = 1 (256 lanes).
Math is identical to models/decoder.py:filter_unet up to float summation
order; parity is asserted by tests/test_filter_packed.py.
"""

from __future__ import annotations

import functools
from fractions import Fraction

import numpy as np

import jax
import jax.numpy as jnp

from alivevc_tpu.config import DecoderConfig
from alivevc_tpu.nn.layers import Params, causal_conv1d, gelu, linear
from alivevc_tpu.ops.interp import _upsample_weights_np


# ---------------------------------------------------------------------------
# block-shift / strided-view helpers
# ---------------------------------------------------------------------------


def _shift_blocks(x: jax.Array, s: int) -> jax.Array:
    """y[:, b] = x[:, b - s], zero beyond the edges."""
    if s == 0:
        return x
    if s > 0:
        pad = jnp.zeros_like(x[:, :s])
        return jnp.concatenate([pad, x[:, :-s]], axis=1)
    pad = jnp.zeros_like(x[:, :(-s)])
    return jnp.concatenate([x[:, -s:], pad], axis=1)


def _strided_blocks(x: jax.Array, delta: int, R: int, b_out: int) -> jax.Array:
    """v[:, b] = x[:, R*b + delta], zero beyond the edges."""
    if R == 1:
        return _shift_blocks(x, -delta)
    n, b_in, w = x.shape
    padl = max(0, -delta)
    padr = max(0, R * (b_out - 1) + delta + 1 - b_in)
    if padl or padr:
        x = jnp.pad(x, ((0, 0), (padl, padr), (0, 0)))
    return x[:, delta + padl :: R][:, :b_out]


# ---------------------------------------------------------------------------
# generic packed linear ops (conv / down / up)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _sel_op(optype: str, kr: int, pad: int, p_in: int, p_out: int):
    """Constant selectors for a packed linear op.

    optype: 'conv' (stride-1, symmetric zero pad), 'down' (kernel=stride=kr),
    'up' (transposed, kernel=stride=kr).  Returns (form, R_or_q, selectors)
    with selectors = ((delta, sel[T, p_in, p_out or q*p_out]), ...).
    """
    if optype == "conv":
        per_out_sample = Fraction(1)
    elif optype == "down":
        per_out_sample = Fraction(kr)
    elif optype == "up":
        per_out_sample = Fraction(1, kr)
    else:  # pragma: no cover
        raise ValueError(optype)
    rfrac = Fraction(p_out) * per_out_sample / p_in
    if rfrac >= 1:
        form, rq = "A", int(rfrac)
        assert rfrac == rq, (optype, kr, p_in, p_out)
        n_phase = p_out
    else:
        form, rq = "B", int(1 / rfrac)
        assert Fraction(1, rq) == rfrac, (optype, kr, p_in, p_out)
        n_phase = rq * p_out

    sels: dict[int, np.ndarray] = {}
    shape = (kr, p_in, p_out if form == "A" else n_phase)
    for op_idx in range(n_phase):
        if optype == "conv":
            contribs = [(j, op_idx - pad + j) for j in range(kr)]
        elif optype == "down":
            contribs = [(j, op_idx * kr + j) for j in range(kr)]
        else:  # up: out sample op_idx reads in sample op_idx//kr with tap op_idx%kr
            u, j = divmod(op_idx, kr)
            contribs = [(j, u)]
        col = op_idx % p_out if form == "A" else op_idx
        for j, in_s in contribs:
            delta, pi = divmod(in_s, p_in)
            sels.setdefault(delta, np.zeros(shape, np.float32))[j, pi, col] += 1.0
    return form, rq, tuple(sorted(sels.items()))


def _packed_linear(
    x: jax.Array,
    w3: jax.Array,          # [taps, Cin, Cout]
    b: jax.Array,           # [Cout]
    optype: str,
    kr: int,
    pad: int,
    p_in: int,
    p_out: int,
    b_out: int,
) -> jax.Array:
    """Apply a conv/down/up between packed layouts [N,Bin,Pin*Cin] → [N,b_out,Pout*Cout]."""
    cin, cout = w3.shape[1], w3.shape[2]
    form, rq, sels = _sel_op(optype, kr, pad, p_in, p_out)
    y = None
    for delta, sel in sels:
        if form == "A":
            m = jnp.einsum("jqp,jio->qipo", jnp.asarray(sel), w3)
            m = m.reshape(p_in * cin, p_out * cout).astype(w3.dtype)
            v = _strided_blocks(x, delta, rq, b_out)
        else:
            m = jnp.einsum("jqs,jio->qiso", jnp.asarray(sel), w3)
            m = m.reshape(p_in * cin, rq * p_out * cout).astype(w3.dtype)
            v = _shift_blocks(x, -delta)
        t = v @ m
        y = t if y is None else y + t
    if form == "B":
        n = x.shape[0]
        y = y.reshape(n, y.shape[1] * rq, p_out * cout)[:, :b_out]
    return y + jnp.tile(b, p_out)


# ---------------------------------------------------------------------------
# packed causal conv (stride 1, left reflect pad) with exact head fix-up
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _sel_causal(k: int, d: int, p: int):
    lookback = (k - 1) * d
    n_prev = -(-lookback // p)
    sels = np.zeros((n_prev + 1, k, p, p), np.float32)
    for j in range(k):
        off = (k - 1 - j) * d
        for po in range(p):
            ti, s = po - off, 0
            while ti < 0:
                ti += p
                s += 1
            sels[s, j, ti, po] = 1.0
    return tuple((s, sels[s]) for s in range(n_prev + 1) if sels[s].any())


def _causal_conv_packed(pp: Params, x: jax.Array, d: int, p: int) -> jax.Array:
    """CausalConv1d on a packed tensor [N, B, p*C]; reflect-pad semantics."""
    w = pp["w"]
    k, c, _ = w.shape
    lookback = (k - 1) * d
    y = None
    for s, sel in _sel_causal(k, d, p):
        m = jnp.einsum("jab,jio->aibo", jnp.asarray(sel), w)
        m = m.reshape(p * c, p * c).astype(w.dtype)
        t = _shift_blocks(x, s) @ m
        y = t if y is None else y + t
    y = y + jnp.tile(pp["b"], p)
    # the bulk path saw zeros before t=0; recompute the first blocks exactly
    # with the reference's left reflect pad
    nb_fix = -(-lookback // p)
    nb_strip = min(x.shape[1], -(-(nb_fix * p + lookback) // p))
    n = x.shape[0]
    strip = x[:, :nb_strip].reshape(n, nb_strip * p, c)
    head = causal_conv1d(pp, strip, d)[:, : nb_fix * p]
    head = head.reshape(n, nb_fix, p * c)
    return jnp.concatenate([head, y[:, nb_fix:]], axis=1)


# ---------------------------------------------------------------------------
# packed FiLM (frame-rate values → packed sample-rate, torch linear interp)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _film_consts(r: int, p: int, c: int) -> np.ndarray:
    """[3, m, p*c] periodic interp weights (m = r // p block phases)."""
    taps = _upsample_weights_np(r)
    m = r // p
    return np.stack([np.repeat(w.reshape(m, p), c, axis=1) for w in taps])


def _film_packed(sf: jax.Array, p: int, r: int, b_out: int) -> jax.Array:
    """sf [N, F, C] → packed [N, b_out, p*C] (linear_interpolate parity)."""
    n, f, c = sf.shape
    m = r // p
    fe = jnp.concatenate([sf[:, :1], sf, sf[:, -1:]], axis=1)       # edge pad
    if p > 1:
        fe = jnp.broadcast_to(fe[:, :, None, :], (n, f + 2, p, c))
        fe = fe.reshape(n, f + 2, p * c)
    g = jnp.repeat(fe, m, axis=1)                                   # [N,(F+2)m,W]
    w = jnp.asarray(_film_consts(r, p, c))                          # [3, m, W] f32
    w = jnp.tile(w, (1, b_out // m + 1, 1))[:, :b_out]
    out = (
        g[:, :b_out].astype(jnp.float32) * w[0]
        + g[:, m : m + b_out].astype(jnp.float32) * w[1]
        + g[:, 2 * m : 2 * m + b_out].astype(jnp.float32) * w[2]
    )
    return out.astype(sf.dtype)


# ---------------------------------------------------------------------------
# res blocks / filter blocks in packed layout
# ---------------------------------------------------------------------------


def _modulated_conv_packed(pp, x, cond, d, p, r, b_out):
    scale = linear(pp["to_scale"], cond) + 1.0
    shift = linear(pp["to_shift"], cond)
    x = x * _film_packed(scale, p, r, b_out) + _film_packed(shift, p, r, b_out)
    return _causal_conv_packed(pp["conv"], x, d, p)


def _res_block_packed(pp, x, cond, d, p, r, b_out):
    res = x
    x = gelu(x)
    x = _modulated_conv_packed(pp["c1"], x, cond, d, p, r, b_out)
    x = gelu(x)
    x = _modulated_conv_packed(pp["c2"], x, cond, d, p, r, b_out)
    return x + res


def _filter_block_packed(pp, x, cond, p, c, r, b_out):
    w, bb = pp["input_conv"]["w"], pp["input_conv"]["b"]
    m = jnp.einsum("pq,io->piqo", jnp.asarray(np.eye(p, dtype=np.float32)), w)
    x = x @ m.reshape(p * c, p * c).astype(w.dtype) + jnp.tile(bb, p)
    for d_idx, blk in enumerate(pp["blocks"]):
        x = _res_block_packed(blk, x, cond, 2 ** d_idx, p, r, b_out)
    return x


def _fused_filter_mode() -> str:
    """The fused Pallas level kernel (kernels/filter_pallas.py) runs the whole
    res-block stack VMEM-resident.  Measured on-chip at the production batch
    (PERF.md round 3, batch 64 bf16): fused wins at every level it compiles —
    W=256 8.2->0.97 ms/8-batch, and the W=128 levels 31.0->23.7 (P=8) and
    67.8->26.5 ms (P=2); the packed XLA path scales superlinearly with batch
    (HBM re-streaming) while the fused kernel stays linear.  'auto' therefore
    fuses every supported level; the W=128 time tile is capped near TB~1000
    (kernels/filter_pallas._choose_tb), which keeps Mosaic compiles at
    seconds (the old TB=3040 choice compiled >10 min at level 0) at no
    measured runtime cost.  ALIVEVC_FUSED_FILTER: '0' off, '1' auto, 'all'
    every supported level (also under interpret mode)."""
    import os

    v = os.environ.get("ALIVEVC_FUSED_FILTER")
    if v is not None:
        return {"0": "off", "1": "auto"}.get(v, v)
    return "auto" if jax.default_backend() == "tpu" else "off"


def _fused_up_ok(x, pin, pout, cout, r_film, f, r_up, k, n_res) -> bool:
    """True when the level can run the r5 fused-up kernel (up conv + skip
    add + res-block stack in one Pallas program).  Gated by the same env
    switch as the plain fused path; ALIVEVC_FUSED_UP=0 disables just the
    up fusion (A/B lever for benches)."""
    import os

    if os.environ.get("ALIVEVC_FUSED_UP") == "0":
        return False
    mode = _fused_filter_mode()
    if mode == "off":
        return False
    if mode != "all" and (pout * cout if cout <= 128 else cout) not in (128, 256):
        return False
    from alivevc_tpu.kernels.filter_pallas import fused_up_supported

    return fused_up_supported(
        x.shape[1], pin, x.shape[2] // max(pin, 1), pout, cout, r_film, f,
        r_up, k, n_res, x.dtype.itemsize,
    )


def _filter_block_dispatch(pp, x, cond, p, c, r, b_out, k):
    mode = _fused_filter_mode()
    if mode != "off" and (mode == "all" or p * c in (128, 256)):
        from alivevc_tpu.kernels.filter_pallas import (
            fused_filter_block,
            fused_supported,
        )

        if fused_supported(x.shape[1], p, c, r, cond.shape[1], k,
                           len(pp["blocks"]), x.dtype.itemsize):
            return fused_filter_block(pp, x, cond, p, c, r, k)
    return _filter_block_packed(pp, x, cond, p, c, r, b_out)


# ---------------------------------------------------------------------------
# top level
# ---------------------------------------------------------------------------


def _pfac(ch: int) -> int:
    """Timesteps per 128-lane group at channel count ch."""
    if ch <= 128:
        if 128 % ch:
            raise ValueError(f"channels {ch} does not divide 128")
        return 128 // ch
    if ch % 128:
        raise ValueError(f"channels {ch} not a multiple of 128")
    return 1


def packed_supported(cfg: DecoderConfig, lw: int) -> bool:
    """True iff this (config, length) maps onto the packed layout: every
    level's channel count tiles the 128-lane dim, every FiLM upsample factor
    is a multiple of the level's pack factor, all block-ratio selectors
    compile, and the sequence is long enough for the reflect-pad fix-ups."""
    rates = list(cfg.filter_rates)
    chans = list(cfg.filter_channels)
    total = int(np.prod(rates))
    if lw % total or lw % 128 or lw // total < 4 * (cfg.filter_kernel_size - 1) + 1:
        return False
    f = lw // total
    try:
        lens = [lw]
        for r in rates:
            if lens[-1] % r:
                return False
            lens.append(lens[-1] // r)
        ps = [_pfac(ch) for ch in chans]
        for i, ch in enumerate(chans):
            if lens[i] % ps[i] or lens[i] % f or (lens[i] // f) % ps[i]:
                return False
        # try-build every selector (cached; raises on non-integer block ratios)
        k = cfg.filter_kernel_size
        _sel_op("conv", 7, 3, 128, ps[0])
        _sel_op("conv", 7, 3, ps[0], 128)
        chan_nexts = chans[1:] + [chans[-1]]
        for i, r in enumerate(rates):
            pout = ps[i + 1] if i + 1 < len(chans) else 1
            _sel_op("down", r, 0, ps[i], pout)
        for i, r in enumerate(reversed(rates)):
            lvl = len(chans) - 1 - i
            pin = ps[lvl + 1] if lvl + 1 < len(chans) else 1
            _sel_op("up", r, 0, pin, ps[lvl])
        for d in (2 ** j for j in range(cfg.filter_dilations)):
            for p in set(ps) | {1}:
                _sel_causal(k, d, p)
    except (ValueError, AssertionError):
        return False
    return True


def filter_unet_packed(
    p: Params, source: jax.Array, c: jax.Array, cfg: DecoderConfig
) -> jax.Array:
    """Drop-in replacement for models.decoder.filter_unet (same params, same
    math up to float summation order): source [N, Lw, 1], c [N, F, 512] →
    [N, Lw, 1]."""
    rates = list(cfg.filter_rates)
    chans = list(cfg.filter_channels)
    n, lw, _ = source.shape
    f = lw // int(np.prod(rates))

    lens = [lw]
    for r in rates:
        lens.append(lens[-1] // r)
    # level i (i<len(chans)) has channel chans[i] and length lens[i]
    ps = [_pfac(ch) for ch in chans]
    bs = [lens[i] // ps[i] for i in range(len(chans))]

    wave = source[..., 0].reshape(n, lw // 128, 128)
    # wave-in conv: stride-1 k=7 pad 3, 1 → chans[0]
    w_in = p["source_in"]["w"]
    x = _packed_linear(
        wave, w_in, p["source_in"]["b"], "conv", w_in.shape[0], 3, 128, ps[0], bs[0]
    )

    # down path
    chan_nexts = chans[1:] + [chans[-1]]
    skips = []
    for i, r in enumerate(rates):
        cin, cout = chans[i], chan_nexts[i]
        pin = ps[i]
        pout = ps[i + 1] if i + 1 < len(chans) else 1
        b_out = lens[i + 1] // pout
        w3 = p["downs"][i]["w"].reshape(r, cin, cout)
        x = _packed_linear(
            x, w3, p["downs"][i]["b"], "down", r, 0, pin, pout, b_out
        )
        skips.append(x)

    # mid causal conv at frame rate (chans[-1] lanes, P=1)
    x = _causal_conv_packed(p["mid_conv"], x, 1, 1)

    # up path
    rchans = list(reversed(chans))
    rrates = list(reversed(rates))
    chan_prevs = [rchans[0]] + rchans[:-1]
    for i, (up, blk, skip, r) in enumerate(
        zip(p["ups"], p["blocks"], reversed(skips), rrates)
    ):
        cin, cout = chan_prevs[i], rchans[i]
        lvl = len(chans) - 1 - i            # level index of the *output*
        pin = ps[lvl + 1] if lvl + 1 < len(chans) else 1
        pout = ps[lvl]
        b_out = bs[lvl]
        w3 = up["w"].reshape(cin, r, cout).transpose(1, 0, 2)
        r_film = lens[lvl] // f
        if _fused_up_ok(x, pin, pout, cout, r_film, f, r,
                        cfg.filter_kernel_size, len(blk["blocks"])):
            from alivevc_tpu.kernels.filter_pallas import fused_filter_block_up

            x = fused_filter_block_up(
                blk, w3, up["b"], x, skip, c, pin, pout, cout, r_film, r,
                cfg.filter_kernel_size,
            )
        else:
            x = _packed_linear(x + skip, w3, up["b"], "up", r, 0, pin, pout,
                               b_out)
            x = _filter_block_dispatch(blk, x, c, pout, cout, r_film, b_out,
                                       cfg.filter_kernel_size)

    # wave-out conv: stride-1 k=7 pad 3, chans[0] → 1
    w_out = p["source_out"]["w"]
    y = _packed_linear(
        x, w_out, p["source_out"]["b"], "conv", w_out.shape[0], 3, ps[0], 128, lw // 128
    )
    return y.reshape(n, lw, 1)
