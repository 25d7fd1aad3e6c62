"""Model parity: reference PyTorch modules (random seeded weights) vs our
JAX models with imported weights — output allclose."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from alivevc_tpu.compat.torch_import import (
    import_content_encoder,
    import_decoder,
    import_discriminator,
    import_f0_estimator,
    import_voice_library,
)
from alivevc_tpu.models.content_encoder import content_encoder
from alivevc_tpu.models.decoder import decoder, feature_extractor, harmonic_oscillator
from alivevc_tpu.models.discriminator import (
    discriminator_feat_loss,
    discriminator_logits,
)
from alivevc_tpu.models.f0_estimator import f0_estimate, f0_estimator
from alivevc_tpu.models.voice_library import voice_library_match
from alivevc_tpu.ops.knn import match_features, match_features_chunked

from ref_loader import load_reference, state_dict_numpy

ref = load_reference()


def _seed(s=0):
    torch.manual_seed(s)
    np.random.seed(s)


def _nc_to_nlc(x):  # [N, C, L] → [N, L, C]
    return np.ascontiguousarray(np.transpose(x, (0, 2, 1)))


# ---------------------------------------------------------------------------
# encoders
# ---------------------------------------------------------------------------


def test_content_encoder_parity():
    _seed(10)
    m = ref.content_encoder.ContentEncoder().eval()
    spec = np.random.randn(2, 641, 60).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(spec)).numpy()
    params = import_content_encoder(state_dict_numpy(m))
    got = np.asarray(content_encoder(params, jnp.asarray(_nc_to_nlc(spec))))
    np.testing.assert_allclose(_nc_to_nlc(want), got, rtol=1e-4, atol=1e-4)


def test_f0_estimator_parity():
    _seed(11)
    m = ref.f0_estimator.F0Estimator().eval()
    spec = np.random.randn(2, 641, 60).astype(np.float32)
    with torch.no_grad():
        want_logits = m(torch.from_numpy(spec)).numpy()
        want_f0 = m.estimate(torch.from_numpy(spec)).numpy()
    params = import_f0_estimator(state_dict_numpy(m))
    got_logits = np.asarray(f0_estimator(params, jnp.asarray(_nc_to_nlc(spec))))
    np.testing.assert_allclose(_nc_to_nlc(want_logits), got_logits, rtol=1e-4, atol=1e-4)
    got_f0 = np.asarray(f0_estimate(params, jnp.asarray(_nc_to_nlc(spec))))
    np.testing.assert_array_equal(_nc_to_nlc(want_f0), got_f0)


# ---------------------------------------------------------------------------
# kNN matching
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("alpha", [0.0, 0.3])
def test_match_features_parity(alpha):
    _seed(12)
    src = np.random.randn(2, 768, 50).astype(np.float32)
    tgt = np.random.randn(2, 768, 300).astype(np.float32)
    with torch.no_grad():
        want = ref.common.match_features(
            torch.from_numpy(src), torch.from_numpy(tgt), k=4, alpha=alpha
        ).numpy()
    got = np.asarray(
        match_features(jnp.asarray(_nc_to_nlc(src)), jnp.asarray(_nc_to_nlc(tgt)), 4, alpha)
    )
    np.testing.assert_allclose(_nc_to_nlc(want), got, rtol=1e-4, atol=1e-5)


def test_match_features_chunked_equals_dense():
    _seed(13)
    src = jnp.asarray(np.random.randn(37, 768).astype(np.float32))
    refr = jnp.asarray(np.random.randn(5000, 768).astype(np.float32))
    dense = match_features(src[None], refr, 4, 0.0)[0]
    chunked = match_features_chunked(src, refr, 4, 0.0, chunk=512)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(chunked), rtol=1e-5, atol=1e-6)


def test_voice_library_parity():
    _seed(14)
    vl = ref.voice_library.VoiceLibrary()
    src = np.random.randn(2, 768, 40).astype(np.float32)
    with torch.no_grad():
        want = vl.match(torch.from_numpy(src)).numpy()
    params = import_voice_library(state_dict_numpy(vl))
    got = np.asarray(voice_library_match(params, jnp.asarray(_nc_to_nlc(src))))
    np.testing.assert_allclose(_nc_to_nlc(want), got, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def test_feature_extractor_parity():
    _seed(15)
    m = ref.decoder.FeatureExtractor().eval()
    content = np.random.randn(2, 768, 20).astype(np.float32)
    f0 = (np.random.rand(2, 1, 20) * 300 + 80).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(content), torch.from_numpy(f0)).numpy()
    params = import_decoder(
        {f"feature_extractor.{k}": v for k, v in state_dict_numpy(m).items()}
        | {"harmonic_oscillator.to_amps.weight": np.zeros((64, 512, 1), np.float32),
           "harmonic_oscillator.to_amps.bias": np.zeros(64, np.float32)}
        | _dummy_filter_sd()
    )["feature_extractor"]
    got = np.asarray(
        feature_extractor(params, jnp.asarray(_nc_to_nlc(content)), jnp.asarray(_nc_to_nlc(f0)))
    )
    np.testing.assert_allclose(_nc_to_nlc(want), got, rtol=2e-4, atol=2e-4)


def _dummy_filter_sd():
    """Minimal filter state-dict entries so import_decoder can run."""
    _seed(999)
    m = ref.decoder.Filter()
    return {f"filter.{k}": v for k, v in state_dict_numpy(m).items()}


@pytest.mark.parametrize("crop,phi", [((0, -1), 0.0), ((640, 1280), 0.0)])
def test_harmonic_oscillator_parity(crop, phi):
    _seed(16)
    m = ref.decoder.HarmonicOscillator().eval()
    feats = np.random.randn(1, 512, 8).astype(np.float32)
    f0 = (np.random.rand(1, 1, 8) * 300 + 80).astype(np.float32)
    with torch.no_grad():
        want_wave, want_phi = m(torch.from_numpy(feats), torch.from_numpy(f0), phi, crop)
    params = {"to_amps": {
        "w": jnp.asarray(m.to_amps.weight.detach().numpy()[:, :, 0].T),
        "b": jnp.asarray(m.to_amps.bias.detach().numpy()),
    }}
    got_wave, got_phi = harmonic_oscillator(
        params, jnp.asarray(_nc_to_nlc(feats)), jnp.asarray(_nc_to_nlc(f0)),
        phi=phi, crop=crop,
    )
    np.testing.assert_allclose(
        _nc_to_nlc(want_wave.numpy()), np.asarray(got_wave), rtol=1e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        _nc_to_nlc(want_phi.numpy()), np.asarray(got_phi), rtol=1e-3, atol=1e-2
    )


def test_decoder_full_parity():
    _seed(17)
    m = ref.decoder.Decoder().eval()
    content = np.random.randn(1, 768, 12).astype(np.float32)
    f0 = (np.random.rand(1, 1, 12) * 300 + 80).astype(np.float32)
    with torch.no_grad():
        want_wave, want_phi = m(torch.from_numpy(content), torch.from_numpy(f0))
    params = import_decoder(state_dict_numpy(m))
    got_wave, got_phi = decoder(params, jnp.asarray(_nc_to_nlc(content)), jnp.asarray(_nc_to_nlc(f0)))
    assert got_wave.shape == (1, 12 * 320)
    np.testing.assert_allclose(
        want_wave.numpy(), np.asarray(got_wave), rtol=1e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        _nc_to_nlc(want_phi.numpy()), np.asarray(got_phi), rtol=1e-3, atol=1e-2
    )


def test_decoder_streaming_crop_phi():
    """Streaming semantics: crop re-zeroes phase, phi carries across chunks
    (realtime_inference.py:122-167)."""
    _seed(18)
    m = ref.decoder.Decoder().eval()
    content = np.random.randn(1, 768, 24).astype(np.float32)
    f0 = (np.full((1, 1, 24), 200.0)).astype(np.float32)
    crop = (3840 - 480, 3840 + 480)
    with torch.no_grad():
        w1, p1 = m(torch.from_numpy(content), torch.from_numpy(f0), phi=0.0, crop=crop)
        phi_t = p1[:, :, crop[1]].unsqueeze(2)
        w2, _ = m(torch.from_numpy(content), torch.from_numpy(f0), phi=phi_t, crop=crop)
    params = import_decoder(state_dict_numpy(m))
    c = jnp.asarray(_nc_to_nlc(content))
    f = jnp.asarray(_nc_to_nlc(f0))
    g1, gp1 = decoder(params, c, f, phi=0.0, crop=crop)
    phi_j = gp1[:, crop[1]][:, None, :]
    g2, _ = decoder(params, c, f, phi=phi_j, crop=crop)
    np.testing.assert_allclose(w1.numpy(), np.asarray(g1), rtol=1e-3, atol=3e-3)
    np.testing.assert_allclose(w2.numpy(), np.asarray(g2), rtol=1e-3, atol=3e-3)


# ---------------------------------------------------------------------------
# discriminator
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_discriminator_logits_parity():
    _seed(19)
    m = ref.discriminator.Discriminator().eval()
    wave = np.random.randn(2, 9600).astype(np.float32) * 0.3
    with torch.no_grad():
        want = [t.numpy() for t in m.logits(torch.from_numpy(wave))]
    params = import_discriminator(state_dict_numpy(m))
    got = discriminator_logits(params, jnp.asarray(wave))
    assert len(want) == len(got) == 11
    for i, (w, g) in enumerate(zip(want, got)):
        g = np.asarray(g)
        # ours: [N, H, W, 1] → torch [N, 1, H, W]
        g = np.transpose(g, (0, 3, 1, 2))
        np.testing.assert_allclose(w, g, rtol=2e-3, atol=2e-3, err_msg=f"logit {i}")


@pytest.mark.slow
def test_discriminator_feat_loss_parity():
    _seed(20)
    m = ref.discriminator.Discriminator().eval()
    fake = np.random.randn(2, 9600).astype(np.float32) * 0.3
    real = np.random.randn(2, 9600).astype(np.float32) * 0.3
    with torch.no_grad():
        want = m.feat_loss(torch.from_numpy(fake), torch.from_numpy(real)).item()
    params = import_discriminator(state_dict_numpy(m))
    got = float(discriminator_feat_loss(params, jnp.asarray(fake), jnp.asarray(real)))
    np.testing.assert_allclose(want, got, rtol=5e-3)


def test_decoder_parity_with_packed_convs(monkeypatch):
    """The TPU lane-packed causal-conv path must match the plain path
    (it is gated off on CPU; force it here)."""
    monkeypatch.setenv("ALIVEVC_FORCE_PACKED", "1")
    test_decoder_full_parity()
