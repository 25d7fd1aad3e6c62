"""Regression gate for the licensed bf16 fast mode (VERDICT r3 item 3b).

The bench headline runs the whole conversion path in bf16 with the
single-pass-bf16 kNN (`impl='pallas', dtype='bf16'`).  That mode is an
*approximation* of the fp32 path; bench.py measures its accuracy budget
on-chip every round (e2e log-mel L1 0.182, top-k flip rate 3.2% at the
100k library, 2026-08-19).  These tests bound the same two quantities at
CPU-tractable shapes so a kernel or model change that silently degrades
the licensed mode fails CI instead of shipping.

Calibration (2026-08-20, CPU, random-init weights, fixed sine windows):
kNN flip rate 1.56% at 256 queries x 4096 library; e2e mel L1 0.141 /
waveform rel-L2 0.090 at 2 windows x 14400 samples, 2048-frame library.
Bounds below carry ~1.8-3x margin over those measurements.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


def test_bf16_knn_flip_rate_bounded():
    """Single-pass bf16 kNN ('default') may flip near-ties vs the exact
    'highest' mode — but only a bounded fraction of queries, and every
    returned neighbour must score within the bf16 rounding noise of the
    exact k-th best (module/common.py:96-109 ranking semantics)."""
    from alivevc_tpu.kernels.knn_pallas import knn_topk_pallas

    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((256, 768)).astype(np.float32))
    lib = jnp.asarray(rng.standard_normal((4096, 768)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        v32, i32 = knn_topk_pallas(src, lib, 4, precision="highest")
        _, i16 = knn_topk_pallas(src, lib, 4, precision="default")
    flips = np.any(np.sort(np.asarray(i32), 1) != np.sort(np.asarray(i16), 1), 1)
    assert flips.mean() <= 0.04, f"bf16 kNN flip rate {flips.mean():.4f} > 4%"

    # quality bound: true fp32 similarity of every bf16-returned neighbour
    # is within the operand-rounding noise of the exact k-th best
    srcn = np.asarray(src) / np.linalg.norm(src, axis=-1, keepdims=True)
    libn = np.asarray(lib) / np.linalg.norm(lib, axis=-1, keepdims=True)
    true_sims = np.take_along_axis(srcn @ libn.T, np.asarray(i16), axis=1)
    kth_best = np.asarray(v32)[:, -1:]
    assert np.all(true_sims >= kth_best - 2e-3)


@pytest.mark.slow
def test_bf16_e2e_mel_budget_bounded():
    """End-to-end: dtype='bf16' vs dtype='fp32' through the same pipeline
    must stay within the licensed log-mel L1 / waveform budget.  The conv
    and filter paths in bf16 dominate this error (PERF.md), so the XLA impl
    exercises the same cast sites the pallas/bf16 headline mode uses."""
    from alivevc_tpu.infer.offline import convert_window
    from alivevc_tpu.models.content_encoder import init_content_encoder
    from alivevc_tpu.models.decoder import init_decoder
    from alivevc_tpu.models.f0_estimator import init_f0_estimator
    from alivevc_tpu.ops.stft import log_mel_spectrogram

    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    ce = init_content_encoder(k1)
    pe = init_f0_estimator(k2)
    dec = init_decoder(k3)
    tgt = jax.random.normal(k4, (2048, 768), jnp.float32)
    t = np.arange(14400) / 16000.0
    x = jnp.asarray(
        np.stack([(0.4 * np.sin(2 * np.pi * f * t)).astype(np.float32)
                  for f in (120.0, 220.0)])
    )
    o32 = convert_window(ce, pe, dec, x, tgt, impl="xla", dtype="fp32")
    o16 = convert_window(ce, pe, dec, x, tgt, impl="xla", dtype="bf16")
    mel_l1 = float(
        jnp.mean(jnp.abs(log_mel_spectrogram(o16) - log_mel_spectrogram(o32)))
    )
    rel_l2 = float(jnp.linalg.norm(o16 - o32) / jnp.linalg.norm(o32))
    assert mel_l1 <= 0.25, f"bf16 e2e mel L1 {mel_l1:.4f} > licensed 0.25"
    assert rel_l2 <= 0.30, f"bf16 e2e waveform rel L2 {rel_l2:.4f} > licensed 0.30"


def test_knn_high_precision_ranking_faithful():
    """The fp32 pallas path now defaults to kNN precision='high' (bf16x3);
    its ranking must stay exactly faithful to the fp32 reference at a
    library size with realistic near-tie density."""
    from alivevc_tpu.kernels.knn_pallas import knn_topk_pallas
    from alivevc_tpu.ops.knn import topk_cosine_chunked

    rng = np.random.default_rng(5)
    src = jnp.asarray(rng.standard_normal((128, 768)).astype(np.float32))
    lib = jnp.asarray(rng.standard_normal((2048, 768)).astype(np.float32))
    want_v, want_i = topk_cosine_chunked(src, lib, 4)
    with pltpu.force_tpu_interpret_mode():
        got_v, got_i = knn_topk_pallas(src, lib, 4, precision="high")
    np.testing.assert_array_equal(np.asarray(want_i), np.asarray(got_i))
    np.testing.assert_allclose(
        np.asarray(want_v), np.asarray(got_v), rtol=1e-4, atol=2e-5
    )
