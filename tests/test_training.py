"""Training smoke tests (SURVEY §4): tiny synthetic batches, N steps, losses
finite and decreasing where expected, gradients flow to the right pytrees."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from alivevc_tpu.models.content_encoder import init_content_encoder
from alivevc_tpu.models.f0_estimator import init_f0_estimator
from alivevc_tpu.train.distill import distill_step, init_distill
from alivevc_tpu.train.f0 import f0_train_step, init_f0_train
from alivevc_tpu.train.fine_tune import fine_tune_step, init_fine_tune
from alivevc_tpu.train.gan import gan_train_step, init_gan
from alivevc_tpu.train.library_gen import generate_voice_library
from alivevc_tpu.train.losses import f0_cross_entropy
from alivevc_tpu.models.voice_library import init_voice_library


def _sine_batch(n, length, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(length) / 16000
    waves = []
    for i in range(n):
        f = rng.uniform(100, 300)
        waves.append(0.5 * np.sin(2 * np.pi * f * t))
    return jnp.asarray(np.stack(waves).astype(np.float32))


def test_distill_loss_decreases():
    state = init_distill(jax.random.PRNGKey(0))
    wave = _sine_batch(2, 6400)
    teacher = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 20, 768)).astype(np.float32) * 0.1
    )
    losses = []
    for _ in range(5):
        state, m = distill_step(state, wave, teacher)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_f0_train_loss_decreases():
    state = init_f0_train(jax.random.PRNGKey(0))
    wave = _sine_batch(2, 6400)
    f0 = jnp.asarray(
        np.random.default_rng(2).uniform(80, 300, size=(2, 20)).astype(np.float32)
    )
    losses = []
    rng = jax.random.PRNGKey(3)
    for i in range(5):
        rng, sub = jax.random.split(rng)
        state, m = f0_train_step(state, wave, f0, sub)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_f0_cross_entropy_ignores_unvoiced():
    logits = jnp.zeros((1, 4, 4096))
    f0_all_unvoiced = jnp.zeros((1, 4))
    # all-ignored → loss 0 (torch returns nan; we define 0 via the max(1) guard)
    assert float(f0_cross_entropy(logits, f0_all_unvoiced)) == 0.0
    f0_mixed = jnp.asarray([[0.0, 100.0, 0.0, 200.0]])
    want = -jax.nn.log_softmax(jnp.zeros(4096))[100]
    np.testing.assert_allclose(float(f0_cross_entropy(logits, f0_mixed)), float(want), rtol=1e-6)


@pytest.mark.slow
def test_gan_step_runs_and_updates():
    key = jax.random.PRNGKey(0)
    state = init_gan(key)
    ce = init_content_encoder(jax.random.PRNGKey(1))
    pe = init_f0_estimator(jax.random.PRNGKey(2))
    wave = _sine_batch(2, 6400)
    dec_before = state.dec_params["filter"]["source_out"]["w"]
    disc_before = state.disc_params["mpd"][0]["input_layer"]["v"]
    state, m = gan_train_step(state, ce, pe, wave, jax.random.PRNGKey(3))
    for k, v in m.items():
        assert np.isfinite(float(v)), k
    assert not np.allclose(np.asarray(dec_before), np.asarray(state.dec_params["filter"]["source_out"]["w"]))
    assert not np.allclose(np.asarray(disc_before), np.asarray(state.disc_params["mpd"][0]["input_layer"]["v"]))


@pytest.mark.slow
def test_fine_tune_step_trains_library():
    ce = init_content_encoder(jax.random.PRNGKey(1))
    pe = init_f0_estimator(jax.random.PRNGKey(2))
    gan = init_gan(jax.random.PRNGKey(0))
    vl = init_voice_library(jax.random.PRNGKey(4))
    state = init_fine_tune(gan.dec_params, gan.disc_params, vl)
    tokens_before = np.asarray(state.vl_params["tokens"])
    wave = _sine_batch(2, 6400)
    state, m = fine_tune_step(
        state, ce, pe, wave, jax.random.PRNGKey(5), use_library=True
    )
    for k, v in m.items():
        assert np.isfinite(float(v)), k
    assert not np.allclose(tokens_before, np.asarray(state.vl_params["tokens"]))


def test_generate_voice_library():
    ce = init_content_encoder(jax.random.PRNGKey(0))
    chunks = np.asarray(_sine_batch(32, 7680))
    lib = generate_voice_library(ce, chunks, seed=7)
    assert lib["tokens"].shape == (512, 768)
    assert np.isfinite(np.asarray(lib["tokens"])).all()
