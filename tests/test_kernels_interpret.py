"""Pallas kernel logic tests in interpreter mode (no TPU needed).

The same kernels are verified on real hardware by scripts/tpu_kernel_check.py
(run on the chip); here the interpreter validates the math against the XLA
reference implementations.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from alivevc_tpu.kernels.knn_pallas import knn_topk_pallas
from alivevc_tpu.kernels.oscillator_pallas import harmonic_source_pallas
from alivevc_tpu.kernels.stft_pallas import stft_magnitude_pallas
from alivevc_tpu.models.decoder import harmonic_oscillator
from alivevc_tpu.ops.knn import topk_cosine_chunked
from alivevc_tpu.ops.stft import stft_magnitude


def test_knn_kernel_interpret():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((37, 768)).astype(np.float32))
    lib = jnp.asarray(rng.standard_normal((1500, 768)).astype(np.float32))
    want_v, want_i = topk_cosine_chunked(src, lib, 4)
    with pltpu.force_tpu_interpret_mode():
        got_v, got_i = knn_topk_pallas(src, lib, 4, tile=512)
    np.testing.assert_array_equal(np.asarray(want_i), np.asarray(got_i))
    np.testing.assert_allclose(np.asarray(want_v), np.asarray(got_v), rtol=1e-5, atol=1e-6)


def test_knn_kernel_interpret_single_tile():
    """Library smaller than one tile: the pipelined grid degenerates to
    (compute, drain) — two steps, one real tile — and the lr mask must drop
    the padding before the only extraction."""
    rng = np.random.default_rng(7)
    src = jnp.asarray(rng.standard_normal((17, 768)).astype(np.float32))
    lib = jnp.asarray(rng.standard_normal((300, 768)).astype(np.float32))
    want_v, want_i = topk_cosine_chunked(src, lib, 4)
    with pltpu.force_tpu_interpret_mode():
        got_v, got_i = knn_topk_pallas(src, lib, 4, tile=512)
    np.testing.assert_array_equal(np.asarray(want_i), np.asarray(got_i))
    np.testing.assert_allclose(np.asarray(want_v), np.asarray(got_v), rtol=1e-5, atol=1e-6)


def test_knn_kernel_interpret_bf16_fast_path():
    """precision='default' streams the library in bf16 with f32 accumulation.

    Ranking may flip on near-ties, so assert *quality*: every returned
    neighbour's true fp32 cosine similarity is within a small margin of the
    exact k-th best for that query.
    """
    rng = np.random.default_rng(3)
    src = jnp.asarray(rng.standard_normal((64, 768)).astype(np.float32))
    lib = jnp.asarray(rng.standard_normal((1024, 768)).astype(np.float32))
    want_v, _ = topk_cosine_chunked(src, lib, 4)
    with pltpu.force_tpu_interpret_mode():
        got_v, got_i = knn_topk_pallas(src, lib, 4, tile=512, precision="default")
    srcn = np.asarray(src) / np.linalg.norm(src, axis=-1, keepdims=True)
    libn = np.asarray(lib) / np.linalg.norm(lib, axis=-1, keepdims=True)
    true_sims = np.take_along_axis(srcn @ libn.T, np.asarray(got_i), axis=1)
    kth_best = np.asarray(want_v)[:, -1:]
    assert np.all(true_sims >= kth_best - 5e-3)
    # reported bf16 sims are close to the true fp32 sims of the same indices
    np.testing.assert_allclose(np.asarray(got_v), true_sims, atol=2e-2)
    # the packed-index extraction variant (kept for reference; measured
    # slower on-chip) must return the same quality
    with pltpu.force_tpu_interpret_mode():
        pk_v, pk_i = knn_topk_pallas(
            src, lib, 4, tile=512, precision="default", extraction="packed"
        )
    pk_sims = np.take_along_axis(srcn @ libn.T, np.asarray(pk_i), axis=1)
    assert np.all(pk_sims >= kth_best - 5e-3)


def test_knn_kernel_interpret_high_precision():
    """precision='high' (manual bf16x3 operand widening) must be f32-faithful:
    exact index parity with the fp32 reference and scores within ~1e-5."""
    rng = np.random.default_rng(11)
    src = jnp.asarray(rng.standard_normal((64, 768)).astype(np.float32))
    lib = jnp.asarray(rng.standard_normal((1024, 768)).astype(np.float32))
    want_v, want_i = topk_cosine_chunked(src, lib, 4)
    with pltpu.force_tpu_interpret_mode():
        got_v, got_i = knn_topk_pallas(src, lib, 4, tile=512, precision="high")
    np.testing.assert_array_equal(np.asarray(want_i), np.asarray(got_i))
    np.testing.assert_allclose(
        np.asarray(want_v), np.asarray(got_v), rtol=1e-4, atol=2e-5
    )


def test_stft_kernel_interpret():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 6400)).astype(np.float32))
    want = stft_magnitude(x)
    with pltpu.force_tpu_interpret_mode():
        got = stft_magnitude_pallas(x)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("frame_tile", [8, 32])
def test_oscillator_cheb_kernel_interpret(frame_tile):
    """Chebyshev-recurrence kernel vs the XLA oscillator, multi-tile (lf >
    frame_tile) so the inter-tile phase carry and the triangular-matmul
    frame-prefix are both exercised."""
    from alivevc_tpu.kernels.oscillator_pallas import harmonic_source_cheb_pallas

    rng = np.random.default_rng(7)
    lf = 70                       # 9 tiles at ft=8, 3 at ft=32 (with pad)
    feats = rng.standard_normal((2, lf, 512)).astype(np.float32)
    f0 = (rng.random((2, lf, 1)) * 300 + 80).astype(np.float32)
    w = jnp.asarray(rng.standard_normal((512, 64)).astype(np.float32)) * 0.05
    params = {"to_amps": {"w": w, "b": jnp.zeros(64)}}
    want, _ = harmonic_oscillator(params, jnp.asarray(feats), jnp.asarray(f0))
    amps = jnp.exp(jnp.asarray(feats) @ w)
    with pltpu.force_tpu_interpret_mode():
        got = harmonic_source_cheb_pallas(jnp.asarray(f0), amps,
                                          frame_tile=frame_tile)
    np.testing.assert_allclose(
        np.asarray(want), np.asarray(got), rtol=1e-3, atol=2e-2
    )


def test_oscillator_kernel_interpret():
    rng = np.random.default_rng(2)
    lf = 20
    feats = rng.standard_normal((1, lf, 512)).astype(np.float32)
    f0 = (rng.random((1, lf, 1)) * 300 + 80).astype(np.float32)
    w = jnp.asarray(rng.standard_normal((512, 64)).astype(np.float32)) * 0.05
    params = {"to_amps": {"w": w, "b": jnp.zeros(64)}}
    want, _ = harmonic_oscillator(params, jnp.asarray(feats), jnp.asarray(f0))
    mul = jnp.arange(1, 65, dtype=jnp.float32)
    formants = jnp.asarray(f0) * mul
    amps = jnp.exp(jnp.asarray(feats) @ w)
    with pltpu.force_tpu_interpret_mode():
        got = harmonic_source_pallas(formants, amps)
    np.testing.assert_allclose(
        np.asarray(want), np.asarray(got), rtol=1e-3, atol=2e-2
    )
