"""Fused filter-level Pallas kernel (kernels/filter_pallas.py) parity vs the
packed XLA implementation, interpret mode.  Covers every level geometry of
the default config (C = 8/16/64/256, P = 16/8/2/1), the multi-tile halo
path, and the full U-Net with fused levels vs the plain reference path.
On-chip validation: scripts/tpu_kernel_check.py (results in PARITY.md)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from alivevc_tpu.config import DecoderConfig
from alivevc_tpu.kernels.filter_pallas import fused_filter_block, fused_supported
from alivevc_tpu.models.decoder import filter_unet, init_decoder
from alivevc_tpu.models.filter_packed import _filter_block_packed, _pfac

CFG = DecoderConfig()
LW = 15360
F = LW // 320


def _level(lvl):
    chans = list(CFG.filter_channels)
    lens = [LW]
    for r in CFG.filter_rates:
        lens.append(lens[-1] // r)
    c = chans[lvl]
    p = _pfac(c)
    return c, p, lens[lvl] // p, lens[lvl] // F


@pytest.fixture(scope="module")
def dec():
    return init_decoder(jax.random.PRNGKey(0))


def test_choose_tb_invariants():
    """Tile geometry rules across every level of the real window lengths:
    Mosaic sublane alignment (TB and FTB multiples of 8), frame alignment
    (TB rows = whole frames), pad consistency, halo fits one tile."""
    from alivevc_tpu.kernels.filter_pallas import (
        _choose_tb,
        _stack_lookback_samples,
    )

    rates = list(CFG.filter_rates)
    chans = list(CFG.filter_channels)
    for lw in (144_000, 48_000, 15_360, 7_680):   # 9 s / 3 s / tests / stream
        f = lw // 320
        lens = [lw]
        for rr in rates:
            lens.append(lens[-1] // rr)
        for lvl, c in enumerate(chans):
            p = _pfac(c)
            w = p * c
            b = lens[lvl] // p
            r = lens[lvl] // f
            if r % p:
                continue
            hb = -(-_stack_lookback_samples(CFG.filter_kernel_size, 3) // p)
            for itemsize in (2, 4):
                tb, b_pad = _choose_tb(b, p, r, w, hb, itemsize)
                assert tb > 0, (lw, lvl, itemsize)
                m = r // p
                assert tb % 8 == 0 and tb % m == 0
                assert (tb * p // r) % 8 == 0      # FTB sublane-aligned
                assert b_pad % tb == 0 and b_pad >= b
                assert tb > hb


@pytest.mark.parametrize("lvl", [0, 1, 2, 3])
def test_fused_level_parity(dec, lvl):
    c, p, b, r = _level(lvl)
    blk = dec["filter"]["blocks"][len(CFG.filter_channels) - 1 - lvl]
    assert fused_supported(b, p, c, r, F)
    rng = np.random.default_rng(lvl)
    x = jnp.asarray(rng.standard_normal((2, b, p * c)).astype(np.float32) * 0.3)
    cond = jnp.asarray(rng.standard_normal((2, F, CFG.channels)).astype(np.float32) * 0.5)
    want = np.asarray(_filter_block_packed(blk, x, cond, p, c, r, b))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_filter_block(blk, x, cond, p, c, r, precision="highest"))
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-6)


@pytest.mark.parametrize("lvl,tb", [(0, 240), (2, 480), (3, 120), (3, 400)])
def test_fused_level_multitile(dec, lvl, tb):
    """Forced small tiles exercise the prev-tile halo ref and the frame-block
    alignment across tile boundaries; (3, 400) does not divide B=480 and so
    exercises the zero-pad tail path (B_pad=800)."""
    c, p, b, r = _level(lvl)
    blk = dec["filter"]["blocks"][len(CFG.filter_channels) - 1 - lvl]
    rng = np.random.default_rng(10 + lvl)
    x = jnp.asarray(rng.standard_normal((2, b, p * c)).astype(np.float32) * 0.3)
    cond = jnp.asarray(rng.standard_normal((2, F, CFG.channels)).astype(np.float32) * 0.5)
    want = np.asarray(_filter_block_packed(blk, x, cond, p, c, r, b))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            fused_filter_block(blk, x, cond, p, c, r, precision="highest",
                               tb_override=tb)
        )
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-6)


@pytest.mark.slow
def test_fused_level_bf16(dec):
    """Production dtype: bf16 activations/params through the fused kernel
    must track the bf16 packed path within bf16 resolution (the two differ
    only in float summation order)."""
    lvl = 3
    c, p, b, r = _level(lvl)
    blk = dec["filter"]["blocks"][len(CFG.filter_channels) - 1 - lvl]
    blk16 = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), blk)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, b, p * c)).astype(np.float32) * 0.3
                    ).astype(jnp.bfloat16)
    cond = jnp.asarray(
        rng.standard_normal((2, F, CFG.channels)).astype(np.float32) * 0.5
    ).astype(jnp.bfloat16)
    want = np.asarray(_filter_block_packed(blk16, x, cond, p, c, r, b)
                      ).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_filter_block(blk16, x, cond, p, c, r)
                         ).astype(np.float32)
    scale = np.abs(want).max() + 1e-3
    assert np.abs(got - want).max() / scale < 0.05


@pytest.mark.slow
def test_fused_gradients_match_packed(dec):
    """custom_vjp routes backward through the packed XLA path; grads wrt
    params, x and cond must match plain AD of the packed implementation."""
    lvl = 3
    c, p, b, r = _level(lvl)
    blk = dec["filter"]["blocks"][len(CFG.filter_channels) - 1 - lvl]
    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.standard_normal((1, b, p * c)).astype(np.float32) * 0.3)
    cond = jnp.asarray(rng.standard_normal((1, F, CFG.channels)).astype(np.float32) * 0.5)

    def loss_fused(blk_, x_, cond_):
        with pltpu.force_tpu_interpret_mode():
            y = fused_filter_block(blk_, x_, cond_, p, c, r, precision="highest")
        return jnp.sum(y * jnp.cos(0.01 * jnp.arange(y.size).reshape(y.shape)))

    def loss_packed(blk_, x_, cond_):
        y = _filter_block_packed(blk_, x_, cond_, p, c, r, b)
        return jnp.sum(y * jnp.cos(0.01 * jnp.arange(y.size).reshape(y.shape)))

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(blk, x, cond)
    g_p = jax.grad(loss_packed, argnums=(0, 1, 2))(blk, x, cond)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_f), jax.tree_util.tree_leaves(g_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_full_unet_fused_vs_plain(dec, monkeypatch):
    from alivevc_tpu.models.filter_packed import filter_unet_packed

    monkeypatch.setenv("ALIVEVC_FUSED_FILTER", "all")
    monkeypatch.setenv("ALIVEVC_FORCE_PACKED", "1")
    rng = np.random.default_rng(3)
    src = jnp.asarray(rng.standard_normal((2, LW, 1)).astype(np.float32) * 0.3)
    cond = jnp.asarray(rng.standard_normal((2, F, CFG.channels)).astype(np.float32) * 0.5)
    monkeypatch.setenv("ALIVEVC_FORCE_PLAIN", "1")
    want = np.asarray(filter_unet(dec["filter"], src, cond, CFG))
    monkeypatch.delenv("ALIVEVC_FORCE_PLAIN")
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(filter_unet_packed(dec["filter"], src, cond, CFG))
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-6)


@pytest.mark.parametrize("film", ["mxu", "mxu1"])
@pytest.mark.parametrize("lvl", [0, 1, 2])
def test_fused_level_parity_mxu_film(dec, lvl, film):
    """film_impl='mxu' (selector-matmul frame->row expansion) must match the
    packed XLA reference as exactly as the VPU expansion — selector dots are
    exact (one nonzero per row), so the tolerance is unchanged."""
    c, p, b, r = _level(lvl)
    blk = dec["filter"]["blocks"][len(CFG.filter_channels) - 1 - lvl]
    rng = np.random.default_rng(20 + lvl)
    x = jnp.asarray(rng.standard_normal((2, b, p * c)).astype(np.float32) * 0.3)
    cond = jnp.asarray(rng.standard_normal((2, F, CFG.channels)).astype(np.float32) * 0.5)
    want = np.asarray(_filter_block_packed(blk, x, cond, p, c, r, b))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            fused_filter_block(blk, x, cond, p, c, r, precision="highest",
                               film_impl=film)
        )
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-6)


def _up_level(i):
    """Geometry of up-loop step i (i=0 deepest) at the test window LW."""
    chans = list(CFG.filter_channels)
    rates = list(CFG.filter_rates)
    lens = [LW]
    for r in rates:
        lens.append(lens[-1] // r)
    ps = [_pfac(ch) for ch in chans]
    lvl = len(chans) - 1 - i
    pin = ps[lvl + 1] if lvl + 1 < len(chans) else 1
    cin = chans[lvl + 1] if lvl + 1 < len(chans) else chans[-1]
    pout, cout = ps[lvl], chans[lvl]
    b_in = lens[lvl + 1] // pin
    b_out = lens[lvl] // pout
    r_film = lens[lvl] // F
    r_up = rates[lvl]
    return pin, cin, pout, cout, b_in, b_out, r_film, r_up, lvl


@pytest.mark.parametrize("i", [0, 1, 2, 3])
def test_fused_up_level_parity(dec, i):
    """r5 fused-up kernel (up conv + skip add + stack in one program) vs the
    XLA packed reference, every up-level geometry of the default config —
    covers both form A (lane-concat view) and form B (in-kernel unfold)."""
    from alivevc_tpu.kernels.filter_pallas import (
        fused_filter_block_up,
        fused_up_supported,
    )
    from alivevc_tpu.models.filter_packed import _packed_linear

    pin, cin, pout, cout, b_in, b_out, r_film, r_up, lvl = _up_level(i)
    blk = dec["filter"]["blocks"][i]
    up = dec["filter"]["ups"][i]
    w3 = up["w"].reshape(cin, r_up, cout).transpose(1, 0, 2)
    assert fused_up_supported(b_in, pin, cin, pout, cout, r_film, F, r_up,
                              itemsize=4)
    rng = np.random.default_rng(30 + i)
    xp = jnp.asarray(rng.standard_normal((2, b_in, pin * cin)).astype(np.float32) * 0.3)
    sk = jnp.asarray(rng.standard_normal((2, b_in, pin * cin)).astype(np.float32) * 0.3)
    cond = jnp.asarray(rng.standard_normal((2, F, CFG.channels)).astype(np.float32) * 0.5)
    xup = _packed_linear(xp + sk, w3, up["b"], "up", r_up, 0, pin, pout, b_out)
    want = np.asarray(_filter_block_packed(blk, xup, cond, pout, cout,
                                           r_film, b_out))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            fused_filter_block_up(blk, w3, up["b"], xp, sk, cond, pin, pout,
                                  cout, r_film, r_up, precision="highest")
        )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-6)


@pytest.mark.parametrize("i,tb", [(0, 160), (1, 320), (3, 160)])
def test_fused_up_multitile(dec, i, tb):
    """Forced small tiles exercise the input-side halo (prev view tile) for
    both up forms."""
    from alivevc_tpu.kernels.filter_pallas import fused_filter_block_up
    from alivevc_tpu.models.filter_packed import _packed_linear

    pin, cin, pout, cout, b_in, b_out, r_film, r_up, lvl = _up_level(i)
    blk = dec["filter"]["blocks"][i]
    up = dec["filter"]["ups"][i]
    w3 = up["w"].reshape(cin, r_up, cout).transpose(1, 0, 2)
    rng = np.random.default_rng(40 + i)
    xp = jnp.asarray(rng.standard_normal((2, b_in, pin * cin)).astype(np.float32) * 0.3)
    sk = jnp.asarray(rng.standard_normal((2, b_in, pin * cin)).astype(np.float32) * 0.3)
    cond = jnp.asarray(rng.standard_normal((2, F, CFG.channels)).astype(np.float32) * 0.5)
    xup = _packed_linear(xp + sk, w3, up["b"], "up", r_up, 0, pin, pout, b_out)
    want = np.asarray(_filter_block_packed(blk, xup, cond, pout, cout,
                                           r_film, b_out))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            fused_filter_block_up(blk, w3, up["b"], xp, sk, cond, pin, pout,
                                  cout, r_film, r_up, precision="highest",
                                  tb_override=tb)
        )
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-6)


@pytest.mark.slow
def test_fused_up_gradients_match_packed(dec):
    """custom_vjp of the fused-up path routes backward through the packed
    XLA composition (up conv + stack); grads must match plain AD."""
    from alivevc_tpu.kernels.filter_pallas import fused_filter_block_up
    from alivevc_tpu.models.filter_packed import _packed_linear

    i = 0
    pin, cin, pout, cout, b_in, b_out, r_film, r_up, lvl = _up_level(i)
    blk = dec["filter"]["blocks"][i]
    up = dec["filter"]["ups"][i]
    w3 = up["w"].reshape(cin, r_up, cout).transpose(1, 0, 2)
    rng = np.random.default_rng(55)
    xp = jnp.asarray(rng.standard_normal((1, b_in, pin * cin)).astype(np.float32) * 0.3)
    sk = jnp.asarray(rng.standard_normal((1, b_in, pin * cin)).astype(np.float32) * 0.3)
    cond = jnp.asarray(rng.standard_normal((1, F, CFG.channels)).astype(np.float32) * 0.5)

    def loss_fused(blk_, w3_, b_, xp_, sk_, c_):
        with pltpu.force_tpu_interpret_mode():
            y = fused_filter_block_up(blk_, w3_, b_, xp_, sk_, c_, pin, pout,
                                      cout, r_film, r_up, precision="highest")
        return jnp.sum(y * jnp.cos(0.01 * jnp.arange(y.size).reshape(y.shape)))

    def loss_packed(blk_, w3_, b_, xp_, sk_, c_):
        xup = _packed_linear(xp_ + sk_, w3_, b_, "up", r_up, 0, pin, pout, b_out)
        y = _filter_block_packed(blk_, xup, c_, pout, cout, r_film, b_out)
        return jnp.sum(y * jnp.cos(0.01 * jnp.arange(y.size).reshape(y.shape)))

    args = (blk, w3, up["b"], xp, sk, cond)
    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(*args)
    g_p = jax.grad(loss_packed, argnums=(0, 1, 2, 3, 4, 5))(*args)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_f), jax.tree_util.tree_leaves(g_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4,
                                   atol=2e-4)


def test_film_selectors_invariants():
    """Selector matrices are exact one-hot row selectors: one nonzero (=1)
    per row per tap, taps select frames q, q+1, q+2 with
    q = (ftb*m - hb + rr) // m — the property that makes the MXU FiLM
    expansion exact in any matmul precision."""
    from alivevc_tpu.kernels.filter_pallas import (
        _film_selectors,
        _stack_lookback_samples,
    )

    for (r, p, tb) in ((320, 16, 960), (160, 8, 960), (40, 2, 960)):
        hb = -(-_stack_lookback_samples(5, 3) // p)
        ftb = tb * p // r
        m = r // p
        tbh = tb + hb
        qmin, kw, sel = _film_selectors(r, p, tbh, hb, ftb)
        assert sel.shape == (3, tbh, kw) and kw % 8 == 0
        # exactly one 1.0 per row per tap, everything else 0
        assert set(np.unique(sel)) <= {0.0, 1.0}
        assert (sel.sum(axis=2) == 1.0).all()
        # tap s selects frame q + s
        for rr in (0, 1, hb, tbh - 1):
            q = (ftb * m - hb + rr) // m
            for s in range(3):
                assert sel[s, rr].argmax() == q + s - qmin, (r, p, rr, s)
