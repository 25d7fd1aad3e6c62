"""F0 labeler (ops/world.py) validation on synthetic harmonic signals —
pyworld is unavailable, so correctness is checked against known ground truth
(SURVEY §7 'Hard parts': validated against synthetic sines)."""

import numpy as np
import pytest

from alivevc_tpu.ops.world import compute_f0, compute_f0_dio, dio, stonemask


def harmonic_signal(f0_hz, fs, dur_s, n_harm=5, seed=0):
    t = np.arange(int(fs * dur_s)) / fs
    rng = np.random.default_rng(seed)
    x = np.zeros_like(t)
    for k in range(1, n_harm + 1):
        x += (1.0 / k) * np.sin(2 * np.pi * k * f0_hz * t + rng.uniform(0, 2 * np.pi))
    return (x / np.abs(x).max()).astype(np.float64)


@pytest.mark.parametrize("f0_true", [110.0, 220.0, 330.0])
def test_dio_stonemask_harmonic(f0_true):
    fs = 8000
    x = harmonic_signal(f0_true, fs, 1.0)
    f0, t = dio(x, fs)
    f0r = stonemask(x, f0, t, fs)
    mid = f0r[20:-20]
    voiced = mid[mid > 0]
    assert voiced.size > 0.8 * mid.size, "mostly voiced expected"
    err = np.abs(voiced - f0_true)
    assert np.median(err) < 2.0, f"median err {np.median(err)}"


def test_compute_f0_shapes_and_values():
    fs = 16000
    t = np.arange(32000) / fs
    x = np.sin(2 * np.pi * 200.0 * t).astype(np.float32)[None]
    f0 = compute_f0(x, fs)
    assert f0.shape == (1, 100)
    mid = f0[0, 10:-10]
    voiced = mid[mid > 0]
    assert voiced.size > 0.8 * mid.size
    assert abs(np.median(voiced) - 200.0) < 4.0


def test_silence_is_unvoiced():
    x = np.zeros(8000)
    f0, _ = dio(x, 8000)
    assert np.all(f0 == 0.0)


def test_compute_f0_dio_length():
    x = harmonic_signal(150.0, 8000, 1.0)
    out = compute_f0_dio(x)
    assert out.shape == (8000 // 256,)
