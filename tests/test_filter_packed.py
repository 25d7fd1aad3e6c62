"""Parity of the lane-dense packed Filter U-Net vs the reference-parity
implementation (models/decoder.py:filter_unet).

The packed path (models/filter_packed.py) reorders float summations
(block matmuls vs conv_general_dilated) but is otherwise the same math —
including the left reflect pad of every causal conv, the symmetric zero pad
of the wave in/out convs, and torch F.interpolate linear semantics for the
FiLM scale/shift upsampling.  Reference: module/decoder.py:105-195.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import flatten_util

from alivevc_tpu.config import DecoderConfig
from alivevc_tpu.models.decoder import filter_unet, init_decoder, init_filter
from alivevc_tpu.models.filter_packed import (
    filter_unet_packed,
    packed_supported,
)


def _mk(lw=1920 * 4, batch=2, seed=0, cfg=DecoderConfig()):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    fp = init_filter(k1, cfg)
    f = lw // cfg.segment_size
    source = jax.random.normal(k2, (batch, lw, 1)) * 0.3
    c = jax.random.normal(k3, (f, batch, cfg.channels)).transpose(1, 0, 2) * 0.5
    return fp, source, c


def test_packed_supported():
    cfg = DecoderConfig()
    assert packed_supported(cfg, 1920 * 4)
    assert packed_supported(cfg, 144_000)
    assert packed_supported(cfg, 7680)        # streaming window
    assert not packed_supported(cfg, 1000)    # not a multiple of 320/128
    tiny = DecoderConfig(filter_channels=(4, 8, 16, 32))
    assert not packed_supported(tiny, 1920 * 4)  # frame-level pack factor 4 ∤ 10


@pytest.mark.slow
def test_filter_packed_matches_plain_fp32():
    cfg = DecoderConfig()
    fp, source, c = _mk()
    ref = filter_unet(fp, source, c, cfg)
    got = filter_unet_packed(fp, source, c, cfg)
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


@pytest.mark.slow
def test_filter_packed_matches_plain_streaming_window():
    cfg = DecoderConfig()
    fp, source, c = _mk(lw=7680, batch=1, seed=3)
    ref = filter_unet(fp, source, c, cfg)
    got = filter_unet_packed(fp, source, c, cfg)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


@pytest.mark.slow
def test_filter_packed_bf16_close():
    cfg = DecoderConfig()
    fp, source, c = _mk(seed=1)
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, t
    )
    fpb, sb, cb = cast(fp), source.astype(jnp.bfloat16), c.astype(jnp.bfloat16)
    ref = filter_unet(fpb, sb, cb, cfg).astype(jnp.float32)
    got = filter_unet_packed(fpb, sb, cb, cfg).astype(jnp.float32)
    # bf16 rounding differs through the packed matmuls; bound the drift
    # against the fp32 truth instead of each other
    truth = filter_unet(fp, source, c, cfg)
    err_ref = float(jnp.abs(ref - truth).max())
    err_got = float(jnp.abs(got - truth).max())
    assert err_got < max(4 * err_ref, 0.05), (err_got, err_ref)


@pytest.mark.slow
def test_filter_packed_grads_flow():
    cfg = DecoderConfig()
    fp, source, c = _mk(lw=1920 * 2, batch=1, seed=2)

    def loss_packed(fp):
        return jnp.mean(filter_unet_packed(fp, source, c, cfg) ** 2)

    def loss_plain(fp):
        return jnp.mean(filter_unet(fp, source, c, cfg) ** 2)

    gp = jax.grad(loss_packed)(fp)
    gr = jax.grad(loss_plain)(fp)
    flat_p, _ = flatten_util.ravel_pytree(gp)
    flat_r, _ = flatten_util.ravel_pytree(gr)
    np.testing.assert_allclose(
        np.asarray(flat_p), np.asarray(flat_r), rtol=5e-3, atol=1e-5
    )
