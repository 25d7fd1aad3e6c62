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
    _run(
        ["alivevc_tpu.cli.export", "-o", "export", "--length", "16"],
        tmp_path,
    )
    files = os.listdir(tmp_path / "export")
    assert len([f for f in files if f.endswith(".stablehlo")]) == 6
