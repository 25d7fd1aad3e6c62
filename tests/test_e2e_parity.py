"""End-to-end offline VC parity: the reference inference.py pipeline (torch,
chunked overlap-discard, pitch/intonation math, kNN match, DDSP decode)
vs our OfflineConverter — waveform allclose on a fixed utterance
(BASELINE.json: 'mel-spectrogram and waveform allclose on fixed utterances')."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from alivevc_tpu.compat.torch_import import (
    import_content_encoder,
    import_decoder,
    import_f0_estimator,
    import_voice_library,
)
from alivevc_tpu.config import InferenceConfig
from alivevc_tpu.infer.offline import OfflineConverter, build_target_matrix
from alivevc_tpu.ops.stft import log_mel_spectrogram

from ref_loader import load_reference, state_dict_numpy

ref = load_reference()


def _reference_offline_convert(PE, CE, Dec, tgt, wave, chunk, pitch, intonation):
    """Faithful re-execution of inference.py:88-135 on a [1, L] tensor."""
    wf = torch.from_numpy(wave)[None, :]
    total_length = wf.shape[1]
    wf = wf / wf.abs().max()
    wf = torch.cat([wf, torch.zeros(1, chunk * 3)], dim=1)
    wf = wf.unsqueeze(1).unsqueeze(1)
    wf = F.pad(wf, (chunk, chunk, 0, 0))
    chunks = F.unfold(wf, (1, chunk * 3), stride=chunk)
    chunks = chunks.transpose(1, 2).split(1, dim=1)

    result = []
    with torch.no_grad():
        for ch in chunks:
            ch = ch.squeeze(1)
            if ch.shape[1] < chunk:
                ch = torch.cat([ch, torch.zeros(1, chunk - ch.shape[1])], dim=1)
            spec = ref.spectrogram.spectrogram(ch)
            f0 = PE.estimate(spec)
            p = 12 * torch.log2(f0 / 440) - 9
            mean_p = p.masked_select(
                torch.logical_not(torch.logical_or(p.isinf(), p.isnan()))
            ).mean()
            p = mean_p + (p - mean_p) * intonation + pitch
            f0 = 440 * 2 ** ((p + 9) / 12)
            f0[torch.logical_or(f0.isnan(), f0.isinf())] = 0
            feat = CE(spec)
            feat = ref.common.match_features(feat, tgt, k=4, alpha=0.0)
            out, _ = Dec(feat, f0)
            result.append(out[:, chunk:-chunk])
    return torch.cat(result, dim=1)[:, :total_length].numpy()[0]


def test_offline_pipeline_waveform_parity():
    torch.manual_seed(42)
    np.random.seed(42)
    PE = ref.f0_estimator.F0Estimator().eval()
    CE = ref.content_encoder.ContentEncoder().eval()
    Dec = ref.decoder.Decoder().eval()
    VL = ref.voice_library.VoiceLibrary()

    # keep argmax-F0 in the speech range and harmonic amplitudes O(1):
    # random weights otherwise emit kHz-scale pitches and exp()-scale
    # amplitudes that amplify fp32 phase-accumulation differences far beyond
    # anything a trained model produces
    with torch.no_grad():
        PE.output_layer.bias[400:] -= 1e9
        Dec.harmonic_oscillator.to_amps.weight *= 0.1
        Dec.harmonic_oscillator.to_amps.bias *= 0.0

    sr = 16000
    t = np.arange(int(1.0 * sr)) / sr
    wave = (
        0.5 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 440 * t + 0.7)
        + 0.05 * np.random.default_rng(0).standard_normal(t.shape)
    ).astype(np.float32)
    target_wave = (0.5 * np.sin(2 * np.pi * 180 * np.arange(8000) / sr)).astype(
        np.float32
    )

    chunk = 4800
    pitch, intonation = 1.5, 1.2

    with torch.no_grad():
        tw = torch.from_numpy(target_wave)[None, :]
        tw = tw / tw.abs().max()
        tgt_t = CE(ref.spectrogram.spectrogram(tw)).detach()
        tgt_t = torch.cat([tgt_t, VL.tokens], dim=2)
    want = _reference_offline_convert(PE, CE, Dec, tgt_t, wave, chunk, pitch, intonation)

    ce = import_content_encoder(state_dict_numpy(CE))
    pe = import_f0_estimator(state_dict_numpy(PE))
    dec = import_decoder(state_dict_numpy(Dec))
    vl = import_voice_library(state_dict_numpy(VL))
    tgt = build_target_matrix(
        ce, target_wave=target_wave / np.abs(target_wave).max(),
        library_tokens=vl["tokens"],
    )
    conv = OfflineConverter(
        ce, pe, dec, tgt,
        InferenceConfig(chunk=chunk, pitch_shift=pitch, intonation=intonation),
    )
    got = conv.convert_16k(wave)

    assert got.shape == want.shape
    # Waveform allclose, quantile form.  Two honest fp32 error sources remain
    # between ANY two fp32 implementations of this pipeline: (1) phase-cumsum
    # reassociation (~2e4 cycles at f0<=400 Hz x 64 harmonics), (2) argmax /
    # top-k flips at floating-point ties in the 4096-way F0 logits and cosine
    # similarities, which change isolated frames entirely.  The bulk of the
    # waveform must match tightly; tie flips are bounded to <1% of samples.
    diff = np.abs(got - want)
    rms = float(np.sqrt(np.mean(want ** 2)))
    assert np.quantile(diff, 0.99) < 0.05 * rms, (
        f"p99 diff {np.quantile(diff, 0.99)} rms {rms}"
    )
    assert diff.mean() < 0.01 * rms, f"mean diff {diff.mean()} rms {rms}"
    # mel allclose — the perceptual-level check
    mel_want = np.asarray(log_mel_spectrogram(jnp.asarray(want)[None]))
    mel_got = np.asarray(log_mel_spectrogram(jnp.asarray(got)[None]))
    mel_diff = np.abs(mel_got - mel_want)
    assert mel_diff.mean() < 1e-2, f"mel mean diff {mel_diff.mean()}"
    assert np.quantile(mel_diff, 0.99) < 0.1, f"mel p99 {np.quantile(mel_diff, 0.99)}"


def test_offline_window_batching_is_invisible():
    """Bounded-memory window batching (max_windows_per_step) must produce
    bit-identical output to converting every window in one jit call."""
    import jax

    from alivevc_tpu.models.content_encoder import init_content_encoder
    from alivevc_tpu.models.decoder import init_decoder
    from alivevc_tpu.models.f0_estimator import init_f0_estimator

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    ce = init_content_encoder(k1)
    pe = init_f0_estimator(k2)
    dec = init_decoder(k3)
    sr = 16000
    wave = np.sin(2 * np.pi * 220 * np.arange(int(1.5 * sr)) / sr).astype(np.float32)
    tw = (0.5 * np.sin(2 * np.pi * 180 * np.arange(8000) / sr)).astype(np.float32)
    tgt = build_target_matrix(ce, target_wave=tw)

    chunk = 2400
    one_shot = OfflineConverter(
        ce, pe, dec, tgt, InferenceConfig(chunk=chunk, max_windows_per_step=1000)
    ).convert_16k(wave)
    batched = OfflineConverter(
        ce, pe, dec, tgt, InferenceConfig(chunk=chunk, max_windows_per_step=4)
    ).convert_16k(wave)
    assert one_shot.shape == batched.shape == wave.shape
    np.testing.assert_allclose(batched, one_shot, rtol=0, atol=1e-6)
