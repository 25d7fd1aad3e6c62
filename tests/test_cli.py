"""CLI end-to-end: inference, library generation, export, file-driven
streaming — all on tiny synthetic data with fresh-init models."""

import os
import subprocess
import sys

import numpy as np
import pytest

from alivevc_tpu.io.audio import read_wav, write_wav

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    XLA_FLAGS="--xla_force_host_platform_device_count=1",
    PYTHONPATH=_REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
)


def _make_wavs(d):
    sr = 16000
    os.makedirs(d / "inputs", exist_ok=True)
    t = np.arange(int(0.8 * sr)) / sr
    write_wav(str(d / "inputs" / "a.wav"),
              (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), sr)
    write_wav(str(d / "target.wav"),
              (0.5 * np.sin(2 * np.pi * 180 * t)).astype(np.float32), sr)


def _run(args, cwd):
    r = subprocess.run(
        [sys.executable, "-m"] + args, cwd=str(cwd), env=ENV,
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, f"stderr:\n{r.stderr[-3000:]}\nstdout:\n{r.stdout[-2000:]}"
    return r


@pytest.mark.slow
def test_cli_inference(tmp_path):
    _make_wavs(tmp_path)
    _run(
        ["alivevc_tpu.cli.inference", "-i", "inputs", "-o", "outputs",
         "-t", "target.wav", "-c", "4800"],
        tmp_path,
    )
    out, sr = read_wav(str(tmp_path / "outputs" / "0_a.wav"))
    assert sr == 16000 and out.shape[1] == int(0.8 * 16000)


@pytest.mark.slow
def test_cli_generate_library_and_stream(tmp_path):
    _make_wavs(tmp_path)
    _run(
        ["alivevc_tpu.cli.generate_voice_library", "inputs",
         "-lib", "vl.ckpt"],
        tmp_path,
    )
    assert (tmp_path / "vl.ckpt").exists()
    _run(
        ["alivevc_tpu.cli.realtime_inference", "--input-wav", "inputs/a.wav",
         "--output-wav", "out.wav", "-lib", "vl.ckpt"],
        tmp_path,
    )
    out, sr = read_wav(str(tmp_path / "out.wav"))
    assert sr == 16000 and out.shape[1] > 0


@pytest.mark.slow
def test_cli_export(tmp_path):
    """Export the six deployment graphs, then deserialize each with
    jax.export and EXECUTE it — outputs must match the eager functions on the
    same fresh-init params (the reference's .onnx artifacts are loadable by
    any ONNX runtime, export_onnx.py:44-130; the StableHLO equivalent of
    that guarantee is an executed round-trip, not file existence)."""
    _run(
        ["alivevc_tpu.cli.export", "-o", "export", "--length", "16"],
        tmp_path,
    )
    files = os.listdir(tmp_path / "export")
    assert len([f for f in files if f.endswith(".stablehlo")]) == 6

    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from alivevc_tpu.config import DecoderConfig
    from alivevc_tpu.models.content_encoder import (
        content_encoder,
        init_content_encoder,
    )
    from alivevc_tpu.models.decoder import (
        feature_extractor,
        filter_unet,
        init_decoder,
    )
    from alivevc_tpu.models.f0_estimator import f0_estimate, init_f0_estimator
    from alivevc_tpu.models.voice_library import (
        init_voice_library,
        voice_library_match,
    )
    from alivevc_tpu.nn.layers import linear
    from alivevc_tpu.ops.interp import linear_interpolate

    # same fresh-init params as the CLI subprocess (no ckpt files in tmp_path
    # => load_params_or_init falls back to init_*(PRNGKey(0)))
    key = jax.random.PRNGKey(0)
    ce = init_content_encoder(key)
    pe = init_f0_estimator(key)
    dec = init_decoder(key)
    vl = init_voice_library(key)
    cfg = DecoderConfig()
    t = 16

    r1, r2, r3, r4 = jax.random.split(jax.random.PRNGKey(7), 4)
    spec = jax.random.normal(r1, (1, t, 641), jnp.float32) * 0.3
    content = jax.random.normal(r2, (1, t, 768), jnp.float32)
    f0 = jnp.abs(jax.random.normal(r3, (1, t, 1), jnp.float32)) * 200.0
    feats = jax.random.normal(r4, (1, t, 512), jnp.float32) * 0.3
    wave = jax.random.normal(r1, (1, t * cfg.segment_size, 1), jnp.float32)

    def osc_amps(x):
        amps = jnp.exp(linear(dec["harmonic_oscillator"]["to_amps"], x))
        return linear_interpolate(amps, x.shape[1] * cfg.segment_size, axis=1)

    cases = {
        "f0_estimator": (lambda x: f0_estimate(pe, x), (spec,)),
        "content_encoder": (lambda x: content_encoder(ce, x), (spec,)),
        "voice_library": (lambda x: voice_library_match(vl, x), (content,)),
        "feature_extractor": (
            lambda x, f: feature_extractor(dec["feature_extractor"], x, f),
            (content, f0),
        ),
        "harmonic_oscillator": (osc_amps, (feats,)),
        "filter": (
            lambda w, c: filter_unet(dec["filter"], w, c, cfg)[..., 0],
            (wave, feats),
        ),
    }
    for name, (fn, args) in cases.items():
        with open(tmp_path / "export" / f"{name}.stablehlo", "rb") as f:
            loaded = jexport.deserialize(bytearray(f.read()))
        got = loaded.call(*args)
        want = fn(*args)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5,
            err_msg=f"round-trip mismatch for {name}",
        )
