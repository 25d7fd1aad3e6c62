"""Interpret-mode checks for the two-pass licensed-bf16 kNN
(kernels/knn_twopass.py — the production route for
``knn_topk_pallas(precision='default')`` with no penalty column)."""

import numpy as np

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from alivevc_tpu.kernels.knn_twopass import knn_topk_twopass
from alivevc_tpu.ops.knn import topk_cosine_chunked


def test_twopass_quality_vs_exact():
    """Same license as the production bf16 'default' mode: every returned
    neighbour's true fp32 similarity within a small margin of the exact
    k-th best, and a bounded flip rate."""
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((128, 768)).astype(np.float32))
    lib = jnp.asarray(rng.standard_normal((2048, 768)).astype(np.float32))
    want_v, want_i = topk_cosine_chunked(src, lib, 4)
    with pltpu.force_tpu_interpret_mode():
        got_v, got_i = knn_topk_twopass(src, lib, 4, tile=512)
    srcn = np.asarray(src) / np.linalg.norm(src, axis=-1, keepdims=True)
    libn = np.asarray(lib) / np.linalg.norm(lib, axis=-1, keepdims=True)
    true_sims = np.take_along_axis(srcn @ libn.T, np.asarray(got_i), axis=1)
    kth_best = np.asarray(want_v)[:, -1:]
    assert np.all(true_sims >= kth_best - 2e-3)
    # reported (packed) values stay close to the true sims of those indices
    np.testing.assert_allclose(np.asarray(got_v), true_sims, atol=2e-2)
    flips = np.any(np.sort(np.asarray(want_i), 1) != np.sort(np.asarray(got_i), 1), 1)
    assert flips.mean() <= 0.06, flips.mean()


def test_twopass_padding_and_single_tile():
    """Library smaller than one tile + non-multiple row count: padding
    columns must never win."""
    rng = np.random.default_rng(3)
    src = jnp.asarray(rng.standard_normal((17, 768)).astype(np.float32))
    lib = jnp.asarray(rng.standard_normal((300, 768)).astype(np.float32))
    _, want_i = topk_cosine_chunked(src, lib, 4)
    with pltpu.force_tpu_interpret_mode():
        _, got_i = knn_topk_twopass(src, lib, 4, tile=512)
    assert np.asarray(got_i).max() < 300
    # bf16 rounding may flip near-ties; require high agreement, not equality
    agree = np.mean(np.sort(np.asarray(want_i), 1) == np.sort(np.asarray(got_i), 1))
    assert agree > 0.9, agree


def test_default_precision_routes_to_twopass():
    """The production entry point's licensed mode IS the two-pass kernel at
    production library sizes (>= 4096 rows): knn_topk_pallas must return the
    two-pass kernel's outputs bit-for-bit (routing guard — a silent fall
    back to the carried kernel would change perf without failing parity)."""
    from alivevc_tpu.kernels.knn_pallas import knn_topk_pallas

    rng = np.random.default_rng(7)
    src = jnp.asarray(rng.standard_normal((64, 768)).astype(np.float32))
    lib = jnp.asarray(rng.standard_normal((4096, 768)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        v_prod, i_prod = knn_topk_pallas(src, lib, 4, precision="default")
        v_two, i_two = knn_topk_twopass(src, lib, 4, tile=512)
    np.testing.assert_array_equal(np.asarray(i_prod), np.asarray(i_two))
    np.testing.assert_array_equal(np.asarray(v_prod), np.asarray(v_two))


def test_penalty_path_routes_to_exact_twopass():
    """The sharded-retrieval path passes a penalty column; at production
    shard sizes it routes to the EXACT two-pass kernel (r5): penalized rows
    must never be returned and ranking must agree with the chunked oracle
    (bf16 operands, so near-ties may flip — require high agreement)."""
    from alivevc_tpu.kernels.knn_pallas import knn_topk_pallas

    rng = np.random.default_rng(11)
    src = jnp.asarray(rng.standard_normal((32, 768)).astype(np.float32))
    lib = jnp.asarray(rng.standard_normal((4600, 768)).astype(np.float32))
    valid = jnp.arange(4600) < 4100
    pen = jnp.where(valid, 0.0, -10.0).astype(jnp.float32)
    _, want_i = topk_cosine_chunked(src, lib, 4, valid=valid)
    with pltpu.force_tpu_interpret_mode():
        _, idx = knn_topk_pallas(src, lib, 4, precision="default", penalty=pen)
    assert np.asarray(idx).max() < 4100
    agree = np.mean(np.sort(np.asarray(want_i), 1) == np.sort(np.asarray(idx), 1))
    assert agree > 0.9, agree


def test_small_library_keeps_carried_kernel():
    """Below the routing threshold (streaming's 512-row library class) the
    carried kernel handles every mode; penalized rows are still excluded."""
    from alivevc_tpu.kernels.knn_pallas import knn_topk_pallas

    rng = np.random.default_rng(12)
    src = jnp.asarray(rng.standard_normal((32, 768)).astype(np.float32))
    lib = jnp.asarray(rng.standard_normal((640, 768)).astype(np.float32))
    pen = jnp.where(jnp.arange(640) >= 512, -10.0, 0.0).astype(jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        _, idx = knn_topk_pallas(src, lib, 4, precision="default", penalty=pen)
    assert np.asarray(idx).max() < 512


def test_exact_twopass_highest_bit_parity():
    """precision='highest' through the two-pass path must rank EXACTLY like
    the dense oracle — the parity contract the fp32 pipeline relies on."""
    rng = np.random.default_rng(17)
    src = jnp.asarray(rng.standard_normal((48, 768)).astype(np.float32))
    lib = jnp.asarray(rng.standard_normal((4608, 768)).astype(np.float32))
    want_v, want_i = topk_cosine_chunked(src, lib, 4)
    with pltpu.force_tpu_interpret_mode():
        got_v, got_i = knn_topk_twopass(src, lib, 4, precision="highest")
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               atol=1e-6, rtol=1e-6)


def test_exact_twopass_high_near_parity():
    """precision='high' (bf16x3 operand widening): scores f32-faithful to
    ~1e-7, ranking agreement essentially exact on random data."""
    rng = np.random.default_rng(19)
    src = jnp.asarray(rng.standard_normal((32, 768)).astype(np.float32))
    lib = jnp.asarray(rng.standard_normal((4608, 768)).astype(np.float32))
    want_v, want_i = topk_cosine_chunked(src, lib, 4)
    with pltpu.force_tpu_interpret_mode():
        got_v, got_i = knn_topk_twopass(src, lib, 4, precision="high")
    agree = np.mean(np.sort(np.asarray(want_i), 1) == np.sort(np.asarray(got_i), 1))
    assert agree == 1.0, agree
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v), atol=1e-5)


def test_exact_twopass_penalty_parity():
    """Exact two-pass with a penalty column ranks identically to the valid-
    masked oracle at 'highest' precision (the sharded-retrieval contract)."""
    rng = np.random.default_rng(23)
    src = jnp.asarray(rng.standard_normal((24, 768)).astype(np.float32))
    lib = jnp.asarray(rng.standard_normal((4700, 768)).astype(np.float32))
    valid = jnp.arange(4700) < 4333
    pen = jnp.where(valid, 0.0, -10.0).astype(jnp.float32)
    want_v, want_i = topk_cosine_chunked(src, lib, 4, valid=valid)
    with pltpu.force_tpu_interpret_mode():
        got_v, got_i = knn_topk_twopass(src, lib, 4, precision="highest",
                                        penalty=pen)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v), atol=1e-6)


def test_valid_rows_suffix_exclusion():
    """Dynamic valid-row count (the r5 sharded fast path) must exclude the
    suffix exactly while keeping the licensed packed kernel: results equal
    the same kernel run on the truncated library (same tile bases, so the
    packing perturbation is identical)."""
    rng = np.random.default_rng(31)
    src = jnp.asarray(rng.standard_normal((32, 768)).astype(np.float32))
    lib = jnp.asarray(rng.standard_normal((4608, 768)).astype(np.float32))
    vr = 4100
    with pltpu.force_tpu_interpret_mode():
        v1, i1 = knn_topk_twopass(src, lib, 4, valid_rows=jnp.int32(vr))
        v2, i2 = knn_topk_twopass(src, lib.at[vr:].set(0.0), 4,
                                  valid_rows=jnp.int32(vr))
    assert np.asarray(i1).max() < vr
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    # agreement with the exact oracle on the truncated library
    from alivevc_tpu.ops.knn import topk_cosine_chunked

    _, want_i = topk_cosine_chunked(src, lib[:vr], 4)
    agree = np.mean(np.sort(np.asarray(want_i), 1) == np.sort(np.asarray(i1), 1))
    assert agree > 0.9, agree


def test_valid_rows_routing_and_exact_mode():
    """knn_topk_pallas(valid_rows=...) routes 'default' to the packed
    two-pass kernel and expresses exact modes as a penalty column — both
    must exclude the suffix."""
    from alivevc_tpu.kernels.knn_pallas import knn_topk_pallas
    from alivevc_tpu.ops.knn import topk_cosine_chunked

    rng = np.random.default_rng(37)
    src = jnp.asarray(rng.standard_normal((16, 768)).astype(np.float32))
    lib = jnp.asarray(rng.standard_normal((4608, 768)).astype(np.float32))
    vr = 4500
    want_v, want_i = topk_cosine_chunked(src, lib[:vr], 4)
    with pltpu.force_tpu_interpret_mode():
        _, i_def = knn_topk_pallas(src, lib, 4, precision="default",
                                   valid_rows=jnp.int32(vr))
        got_v, got_i = knn_topk_pallas(src, lib, 4, precision="highest",
                                       valid_rows=jnp.int32(vr))
    assert np.asarray(i_def).max() < vr
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v), atol=1e-6)


def test_hierarchical_merge_parity(monkeypatch):
    """Force the chunked pass-B path (as a 1M-row library would) and check
    it is bit-identical to the single-block merge — bounded VMEM must not
    change results (advisor r4 item)."""
    import alivevc_tpu.kernels.knn_twopass as tp

    rng = np.random.default_rng(29)
    src = jnp.asarray(rng.standard_normal((16, 768)).astype(np.float32))
    lib = jnp.asarray(rng.standard_normal((9000, 768)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        v1, i1 = knn_topk_twopass(src, lib, 4, precision="highest")
        v1p, i1p = knn_topk_twopass(src, lib, 4)
    monkeypatch.setattr(tp, "_MERGE_MAX", 16)
    tp.knn_topk_twopass.clear_cache()
    try:
        with pltpu.force_tpu_interpret_mode():
            v2, i2 = knn_topk_twopass(src, lib, 4, precision="highest")
            v2p, i2p = knn_topk_twopass(src, lib, 4)
    finally:
        monkeypatch.undo()
        tp.knn_topk_twopass.clear_cache()
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1p), np.asarray(i2p))
    np.testing.assert_array_equal(np.asarray(v1p), np.asarray(v2p))


def test_twopass_ragged_query_count():
    """Query counts that are not multiples of 8/q_tile pad internally and
    crop exactly (the e2e batched match flattens 64 windows x 45 frames)."""
    rng = np.random.default_rng(13)
    src = jnp.asarray(rng.standard_normal((13, 768)).astype(np.float32))
    lib = jnp.asarray(rng.standard_normal((2048, 768)).astype(np.float32))
    _, want_i = topk_cosine_chunked(src, lib, 4)
    with pltpu.force_tpu_interpret_mode():
        vals, got_i = knn_topk_twopass(src, lib, 4, tile=512)
    assert vals.shape == (13, 4) and got_i.shape == (13, 4)
    agree = np.mean(np.sort(np.asarray(want_i), 1) == np.sort(np.asarray(got_i), 1))
    assert agree > 0.9, agree
