"""Multi-device tests on the 8-device virtual CPU mesh: sharded-library kNN
must equal the dense single-device match exactly; halo-exchange time sharding
must equal the dense encoder."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from alivevc_tpu.models.content_encoder import content_encoder, init_content_encoder
from alivevc_tpu.models.f0_estimator import f0_estimator, init_f0_estimator
from alivevc_tpu.ops.knn import match_features
from alivevc_tpu.parallel.halo import (
    content_encoder_sharded,
    f0_estimator_sharded,
    sharded_frame_model,
)
from alivevc_tpu.parallel.mesh import make_mesh, replicate, shard_along
from alivevc_tpu.parallel.sharded_knn import (
    pad_library_for_sharding,
    sharded_match_features,
)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "tests need 8 virtual CPU devices"
    return make_mesh([("library", 8)])


def test_sharded_knn_equals_dense(mesh8):
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((37, 768)).astype(np.float32))
    lib = jnp.asarray(rng.standard_normal((1000, 768)).astype(np.float32))

    dense = match_features(src[None], lib, 4, 0.0)[0]
    lib_p, valid = pad_library_for_sharding(lib, 8)
    sharded = sharded_match_features(mesh8, src, lib_p, valid, k=4, chunk=64)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(sharded), rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_sharded_knn_1m_frames(mesh8):
    """BASELINE config #5 at spec: a 1M+-frame library sharded across the
    8-device mesh must match the dense single-device result exactly
    (score-merge + vector-psum path, 125k rows per shard).  Queries are kept
    small so the dense oracle stays CPU-tractable; the per-shard kernel
    shape (125k rows) is the same one the pod path runs per chip."""
    rng = np.random.default_rng(7)
    src = jnp.asarray(rng.standard_normal((16, 768)).astype(np.float32))
    lib = jnp.asarray((rng.standard_normal((1_000_003, 768)) * 0.5)
                      .astype(np.float32))
    dense = match_features(src[None], lib, 4, 0.0)[0]
    lib_p, valid = pad_library_for_sharding(lib, 8)
    sharded = sharded_match_features(mesh8, src, lib_p, valid, k=4,
                                     chunk=8192)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(sharded),
                               rtol=1e-6, atol=1e-6)


def test_sharded_knn_default_precision_plumbing(mesh8, monkeypatch):
    """precision='default' through the sharded path must take the r5 pod
    fast path: each shard's kernel call gets precision='default' and a
    dynamic valid_rows scalar (NO penalty column), and the valid-row count
    excludes exactly the shard's padding suffix.  The kernel itself is spied
    out with an exact oracle (interpret-mode pallas deadlocks inside
    shard_map on the CPU backend; the packed kernel's valid_rows behavior
    is covered by test_knn_twopass + the on-chip kernel check)."""
    import alivevc_tpu.parallel.sharded_knn as sk

    seen = []

    def spy(src_, lib_, k=4, precision=None, valid_rows=None, penalty=None,
            **kw):
        seen.append((precision, valid_rows is not None, penalty is None))
        valid_mask = jnp.arange(lib_.shape[0]) < valid_rows
        from alivevc_tpu.ops.knn import topk_cosine_chunked

        return topk_cosine_chunked(src_, lib_, k, chunk=lib_.shape[0],
                                   valid=valid_mask)

    import alivevc_tpu.kernels.knn_pallas as kp

    monkeypatch.setattr(kp, "knn_topk_pallas", spy)
    rng = np.random.default_rng(9)
    src = jnp.asarray(rng.standard_normal((32, 768)).astype(np.float32))
    lib = jnp.asarray(rng.standard_normal((900, 768)).astype(np.float32))
    dense = match_features(src[None], lib, 4, 0.0)[0]
    lib_p, valid = pad_library_for_sharding(lib, 8)
    sharded = sharded_match_features(mesh8, src, lib_p, valid, k=4,
                                     chunk=64, impl="pallas",
                                     precision="default")
    assert seen and all(s == ("default", True, True) for s in seen), seen
    np.testing.assert_allclose(np.asarray(dense), np.asarray(sharded),
                               rtol=1e-5, atol=1e-5)


def test_sharded_knn_duplicate_winner(mesh8):
    """Row duplicated across shards + padding rows must not perturb the mean."""
    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.standard_normal((5, 768)).astype(np.float32))
    base = rng.standard_normal((997, 768)).astype(np.float32)  # odd → padding
    base[500] = base[0]  # duplicate in another shard
    lib = jnp.asarray(base)
    dense = match_features(src[None], lib, 4, 0.0)[0]
    lib_p, valid = pad_library_for_sharding(lib, 8)
    sharded = sharded_match_features(mesh8, src, lib_p, valid, k=4, chunk=32)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(sharded), rtol=1e-6, atol=1e-6)


def test_knn_pallas_penalty_column_excludes_padding():
    """The penalty-column trick the pallas sharded impl relies on: rows with
    penalty -4 never appear in any top-k (cosine lives in [-1, 1]) and rows
    with penalty 0 keep bit-exact scores and lax.top_k index ordering.  The
    cross-shard merge itself is impl-independent and covered above; pallas
    interpret under an 8-way shard_map is too slow to run in CI."""
    from jax.experimental.pallas import tpu as pltpu

    from alivevc_tpu.kernels.knn_pallas import knn_topk_pallas
    from alivevc_tpu.ops.knn import topk_cosine_chunked

    rng = np.random.default_rng(4)
    src = jnp.asarray(rng.standard_normal((21, 768)).astype(np.float32))
    lib = jnp.asarray(rng.standard_normal((125, 768)).astype(np.float32))
    valid = jnp.arange(125) < 93                       # trailing padding rows
    pen = jnp.where(valid, 0.0, -4.0)
    want_v, want_i = topk_cosine_chunked(src, lib, 4, chunk=64, valid=valid)
    with pltpu.force_tpu_interpret_mode():
        got_v, got_i = knn_topk_pallas(src, lib, 4, penalty=pen)
    np.testing.assert_array_equal(np.asarray(want_i), np.asarray(got_i))
    np.testing.assert_allclose(
        np.asarray(want_v), np.asarray(got_v), rtol=1e-5, atol=1e-6
    )


@pytest.mark.slow
def test_halo_content_encoder_equals_dense():
    mesh = make_mesh([("data", 8)])
    params = init_content_encoder(jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    spec = jnp.asarray(rng.standard_normal((160, 641)).astype(np.float32))

    dense = content_encoder(params, spec[None])[0]
    sharded = sharded_frame_model(
        mesh, lambda x, ax: content_encoder_sharded(params, x, ax), spec, "data"
    )
    np.testing.assert_allclose(np.asarray(dense), np.asarray(sharded), rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_halo_f0_estimator_equals_dense():
    mesh = make_mesh([("data", 8)])
    params = init_f0_estimator(jax.random.PRNGKey(1))
    rng = np.random.default_rng(3)
    spec = jnp.asarray(rng.standard_normal((80, 641)).astype(np.float32))
    dense = f0_estimator(params, spec[None])[0]
    sharded = sharded_frame_model(
        mesh, lambda x, ax: f0_estimator_sharded(params, x, ax), spec, "data"
    )
    np.testing.assert_allclose(np.asarray(dense), np.asarray(sharded), rtol=2e-5, atol=2e-5)


def test_replicate_and_shard_helpers():
    mesh = make_mesh([("data", 8)])
    params = {"w": jnp.ones((4, 4))}
    rep = replicate(params, mesh)
    assert rep["w"].sharding.is_fully_replicated
    x = jnp.zeros((16, 3))
    xs = shard_along(x, mesh, "data", 0)
    assert not xs.sharding.is_fully_replicated


@pytest.mark.slow
def test_distributed_vc_equals_single_device():
    """Config #5 skeleton: 2x4 ('data','library') mesh VC == dense pipeline."""
    from alivevc_tpu.infer.offline import convert_window
    from alivevc_tpu.models.content_encoder import init_content_encoder
    from alivevc_tpu.models.decoder import init_decoder
    from alivevc_tpu.models.f0_estimator import init_f0_estimator
    from alivevc_tpu.parallel.distributed_vc import convert_windows_distributed

    mesh = make_mesh([("data", 2), ("library", 4)])
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    ce = init_content_encoder(k1)
    pe = init_f0_estimator(k2)
    dec = init_decoder(k3)
    lib = jax.random.normal(k4, (999, 768))

    rng = np.random.default_rng(0)
    windows = jnp.asarray(rng.standard_normal((2, 9600)).astype(np.float32) * 0.3)

    dense = convert_window(ce, pe, dec, windows, lib)
    dist = convert_windows_distributed(mesh, ce, pe, dec, windows, lib)
    np.testing.assert_allclose(
        np.asarray(dense), np.asarray(dist), rtol=1e-3, atol=2e-3
    )


def test_dcn_multiprocess():
    """Multi-process (DCN-path) leg: 2 local JAX processes, each with 2
    virtual CPU devices, joined via jax.distributed.initialize — verifies
    cross-process psum and the sharded-kNN merge (SURVEY §4 'multi-process
    tests via jax.distributed.initialize with local processes')."""
    import subprocess
    import sys
    import os

    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "dcn_dryrun.py",
    )
    proc = subprocess.run(
        [sys.executable, script], capture_output=True, text=True, timeout=240
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "dcn_dryrun: 2 processes x 2 devices OK" in proc.stdout


@pytest.mark.slow
def test_dp_gan_step_full_size_configs():
    """VERDICT r3 item 6: the full-size GAN training step (production
    DecoderConfig/DiscriminatorConfig — 11 sub-discriminators) executed
    under ('data',) sharding on the 8-device mesh, so "full-size training
    is SPMD-safe" is an executed fact, not an inference from the tiny
    dryrun configs (__graft_entry__.py uses reduced configs for CPU
    compile cost; this test pays that cost once, in the slow tier).  Uses
    the explicit-SPMD dp step (local grads + pmean — the multi-host
    training path; scripts/comm_volume.py measures its traffic floor)."""
    from alivevc_tpu.train.gan import dp_gan_train_step, init_gan

    mesh = make_mesh([("data", 8)])
    state = init_gan(jax.random.PRNGKey(0))          # production configs
    ce = init_content_encoder(jax.random.PRNGKey(1))
    pe = init_f0_estimator(jax.random.PRNGKey(2))
    state = replicate(state, mesh)
    ce_r = replicate(ce, mesh)
    pe_r = replicate(pe, mesh)

    t = np.arange(6400) / 16000.0
    wave = np.stack(
        [0.5 * np.sin(2 * np.pi * (110 + 15 * i) * t) for i in range(8)]
    ).astype(np.float32)
    wave_s = shard_along(jnp.asarray(wave), mesh, "data", 0)

    dec_before = np.asarray(state.dec_params["filter"]["source_out"]["w"])
    state, metrics = dp_gan_train_step(
        mesh, state, ce_r, pe_r, wave_s, jax.random.PRNGKey(3)
    )
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"non-finite {k} in full-size dp GAN step"
    assert not np.allclose(
        dec_before, np.asarray(state.dec_params["filter"]["source_out"]["w"])
    )
    # params must stay replicated after the update (grad psum inserted by
    # the partitioner, same update applied on every device)
    assert state.dec_params["filter"]["source_out"]["w"].sharding.is_fully_replicated


@pytest.mark.slow
def test_halo_feature_extractor_equals_dense():
    """Halo SP now covers every frame-rate ConvNeXt stack: the decoder's
    FeatureExtractor (AdaptiveConvNeXt + pointwise F0 condition) sharded
    along time must equal the dense model (VERDICT r3 item 9)."""
    from jax.sharding import PartitionSpec as P

    from alivevc_tpu.config import DecoderConfig
    from alivevc_tpu.models.decoder import feature_extractor, init_feature_extractor
    from alivevc_tpu.parallel.halo import feature_extractor_sharded

    params = init_feature_extractor(jax.random.PRNGKey(0), DecoderConfig())
    mesh = make_mesh([("data", 8)])
    rng = np.random.default_rng(3)
    content = jnp.asarray(rng.standard_normal((80, 768)).astype(np.float32))
    f0 = jnp.asarray((rng.random((80, 1)) * 300 + 80).astype(np.float32))

    dense = feature_extractor(params, content[None], f0[None])[0]
    fn = jax.shard_map(
        lambda c, f: feature_extractor_sharded(params, c, f, "data"),
        mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P("data"),
        check_vma=False,
    )
    sharded = fn(content, f0)
    np.testing.assert_allclose(
        np.asarray(dense), np.asarray(sharded), rtol=2e-5, atol=2e-5
    )


@pytest.mark.slow
def test_dp_distill_step_equals_dense():
    """Explicit-dp distillation (local grads + pmean) must produce the same
    updated params as the dense single-device step on the same global batch
    (no RNG in the distill step, so the comparison is direct)."""
    from alivevc_tpu.train.distill import distill_step, dp_distill_step, init_distill

    mesh = make_mesh([("data", 8)])
    state = init_distill(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.standard_normal((8, 3200)).astype(np.float32) * 0.3)
    teacher = jnp.asarray(rng.standard_normal((8, 10, 768)).astype(np.float32))

    dense, md = distill_step(state, wave, teacher)
    state_r = replicate(state, mesh)
    wave_s = shard_along(wave, mesh, "data", 0)
    teacher_s = shard_along(teacher, mesh, "data", 0)
    dp, mp = dp_distill_step(mesh, state_r, wave_s, teacher_s)

    np.testing.assert_allclose(float(md["loss"]), float(mp["loss"]), rtol=1e-5)
    a = jax.tree_util.tree_leaves(dense.params)
    b = jax.tree_util.tree_leaves(dp.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_dp_f0_train_step_runs_and_updates():
    """dp F0 step: psum of (NLL sum, voiced count) makes the sharded
    ignore_index mean exact; params update and stay replicated."""
    from alivevc_tpu.train.f0 import dp_f0_train_step, init_f0_train

    mesh = make_mesh([("data", 8)])
    state = replicate(init_f0_train(jax.random.PRNGKey(0)), mesh)
    rng = np.random.default_rng(1)
    wave = shard_along(
        jnp.asarray(rng.standard_normal((8, 3200)).astype(np.float32) * 0.3),
        mesh, "data", 0,
    )
    f0 = shard_along(
        jnp.asarray((rng.random((8, 10)) * 300).astype(np.float32)),
        mesh, "data", 0,
    )
    before = np.asarray(state.params["output_layer"]["w"])
    state, m = dp_f0_train_step(mesh, state, wave, f0, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))
    after = state.params["output_layer"]["w"]
    assert not np.allclose(before, np.asarray(after))
    assert after.sharding.is_fully_replicated


@pytest.mark.slow
def test_dp_fine_tune_step_trains_library():
    """dp fine-tune: three optimizers (decoder, discriminator, voice-library
    tokens) on pmean'd grads; tokens update and everything stays replicated."""
    from alivevc_tpu.models.voice_library import init_voice_library
    from alivevc_tpu.train.fine_tune import dp_fine_tune_step, init_fine_tune
    from alivevc_tpu.train.gan import init_gan

    mesh = make_mesh([("data", 8)])
    gan = init_gan(jax.random.PRNGKey(0))
    vl = init_voice_library(jax.random.PRNGKey(4))
    state = replicate(init_fine_tune(gan.dec_params, gan.disc_params, vl), mesh)
    ce = replicate(init_content_encoder(jax.random.PRNGKey(1)), mesh)
    pe = replicate(init_f0_estimator(jax.random.PRNGKey(2)), mesh)

    t = np.arange(6400) / 16000.0
    wave = np.stack(
        [0.5 * np.sin(2 * np.pi * (130 + 10 * i) * t) for i in range(8)]
    ).astype(np.float32)
    wave_s = shard_along(jnp.asarray(wave), mesh, "data", 0)

    tokens_before = np.asarray(state.vl_params["tokens"])
    state, m = dp_fine_tune_step(
        mesh, state, ce, pe, wave_s, jax.random.PRNGKey(5), use_library=True
    )
    for k, v in m.items():
        assert np.isfinite(float(v)), k
    assert not np.allclose(tokens_before, np.asarray(state.vl_params["tokens"]))
    assert state.vl_params["tokens"].sharding.is_fully_replicated
