"""JAX WavLM teacher vs the torch implementation (random seeded weights —
weights import identically for the real microsoft/wavlm-base-plus)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from alivevc_tpu.models.wavlm import (
    WavLMConfig,
    import_wavlm,
    wavlm_features,
    wavlm_hidden_states,
)


@pytest.fixture(scope="module")
def torch_wavlm():
    from transformers import WavLMConfig as HFConfig, WavLMModel

    torch.manual_seed(0)
    cfg = HFConfig(
        hidden_size=768,
        num_hidden_layers=12,
        num_attention_heads=12,
        intermediate_size=3072,
        feat_extract_norm="group",
        do_stable_layer_norm=False,
        conv_bias=False,
        num_buckets=320,
        max_bucket_distance=800,
        layerdrop=0.0,
    )
    model = WavLMModel(cfg).eval()
    return model


@pytest.mark.slow
def test_wavlm_hidden_states_parity(torch_wavlm):
    sd = {k: v.detach().numpy() for k, v in torch_wavlm.state_dict().items()}
    params = import_wavlm(sd)

    rng = np.random.default_rng(0)
    wave = (rng.standard_normal((2, 8000)) * 0.1).astype(np.float32)

    with torch.no_grad():
        want = torch_wavlm(
            torch.from_numpy(wave), output_hidden_states=True
        ).hidden_states

    got = wavlm_hidden_states(params, jnp.asarray(wave))
    assert len(got) == len(want) == 13
    for i in (0, 4, 9, 12):
        np.testing.assert_allclose(
            want[i].numpy(), np.asarray(got[i]), rtol=1e-3, atol=2e-4,
            err_msg=f"hidden state {i}",
        )


def test_wavlm_features_match_reference_semantics(torch_wavlm):
    """extract_hubert_feature (module/hubert.py:15-22) parity."""
    import torch.nn.functional as F

    sd = {k: v.detach().numpy() for k, v in torch_wavlm.state_dict().items()}
    params = import_wavlm(sd)
    rng = np.random.default_rng(1)
    wave = (rng.standard_normal((1, 6400)) * 0.1).astype(np.float32)

    with torch.no_grad():
        hs = torch_wavlm(torch.from_numpy(wave), output_hidden_states=True).hidden_states
        feat = (hs[4] + hs[9]) * 0.5
        feat = feat.transpose(1, 2)
        feat = F.interpolate(feat, wave.shape[1] // 320, mode="linear")
        want = feat.transpose(1, 2).numpy()

    got = np.asarray(wavlm_features(params, jnp.asarray(wave)))
    assert got.shape == (1, 20, 768)
    np.testing.assert_allclose(want, got, rtol=1e-3, atol=2e-4)
