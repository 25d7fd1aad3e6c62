"""WORLD (DIO + StoneMask) fidelity on realistic signals.

The synthetic-harmonic checks in test_world.py establish basic correctness;
these tests stress the label generator with the phenomena real speech has —
vibrato, amplitude jitter, additive noise, voiced/unvoiced transitions, low
male F0, and an octave-error trap (dominant 2nd harmonic) — because F0-label
quality directly bounds F0Estimator training quality (reference label source:
module/common.py:113-137 via pyworld).

Every case is also cross-checked C++ (native/world.cpp) vs numpy.
"""

import os
import subprocess

import numpy as np
import pytest

from alivevc_tpu.native_bindings import dio_stonemask_native, native_available
from alivevc_tpu.ops.world import dio, stonemask

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FS = 8000


@pytest.fixture(scope="module", autouse=True)
def build_native():
    if not native_available():
        subprocess.run(["make", "-C", os.path.join(REPO, "native")], check=True)
    assert native_available()


def synth(f0_of_t, dur, amps=(1.0, 0.5, 0.33, 0.25, 0.2), amp_of_t=None,
          noise_snr_db=None, seed=0):
    """Harmonic signal with time-varying F0 via phase integration."""
    n = int(FS * dur)
    t = np.arange(n) / FS
    f0 = f0_of_t(t)
    phase = 2 * np.pi * np.cumsum(f0) / FS
    x = sum(a * np.sin((k + 1) * phase) for k, a in enumerate(amps))
    if amp_of_t is not None:
        x = x * amp_of_t(t)
    x = x / np.abs(x).max()
    if noise_snr_db is not None:
        rng = np.random.default_rng(seed)
        noise = rng.standard_normal(n)
        noise *= np.sqrt(np.mean(x**2)) / np.sqrt(np.mean(noise**2)) * (
            10 ** (-noise_snr_db / 20)
        )
        x = x + noise
    return x.astype(np.float64), f0


def estimate_py(x):
    f0, t = dio(x, FS)
    return stonemask(x, f0, t, FS), t


def _interior(arr, margin=20):
    return arr[margin:-margin]


def _check_cpp_agrees(x, f0_py):
    f0_cpp = dio_stonemask_native(x, FS)
    assert f0_cpp.shape == f0_py.shape
    v_py = _interior(f0_py) > 0
    v_cpp = _interior(f0_cpp) > 0
    assert (v_py == v_cpp).mean() > 0.9, "C++/numpy voicing disagreement"
    both = v_py & v_cpp
    if both.any():
        d = np.abs(_interior(f0_py)[both] - _interior(f0_cpp)[both])
        assert np.median(d) < 2.0, f"C++/numpy median |Δf0| {np.median(d)}"


def test_vibrato_tracking():
    """5 Hz vibrato, ±3% depth around 150 Hz — must track the modulation."""
    x, f0_true = synth(lambda t: 150.0 * (1 + 0.03 * np.sin(2 * np.pi * 5 * t)), 1.5)
    f0, t = estimate_py(x)
    truth = np.interp(t, np.arange(len(f0_true)) / FS, f0_true)
    vi = _interior(f0) > 0
    assert vi.mean() > 0.8, f"voiced recall {vi.mean()}"
    err = np.abs(_interior(f0)[vi] - _interior(truth)[vi])
    assert np.median(err) < 3.0, f"median err {np.median(err)} Hz"
    # the estimate must actually follow the vibrato, not sit at the mean:
    est_dev = _interior(f0)[vi] - 150.0
    true_dev = _interior(truth)[vi] - 150.0
    corr = np.corrcoef(est_dev, true_dev)[0, 1]
    assert corr > 0.8, f"vibrato correlation {corr}"
    _check_cpp_agrees(x, f0)


def test_jitter_and_noise():
    """Amplitude jitter (±50%, 8 Hz random modulation) + 20 dB SNR noise."""
    rng = np.random.default_rng(1)
    mod_pts = rng.uniform(0.5, 1.5, 16)

    def amp_of_t(t):
        return np.interp(t, np.linspace(0, t[-1], 16), mod_pts)

    x, _ = synth(lambda t: np.full_like(t, 120.0), 1.5, amp_of_t=amp_of_t,
                 noise_snr_db=20, seed=2)
    f0, _ = estimate_py(x)
    vi = _interior(f0) > 0
    assert vi.mean() > 0.8, f"voiced recall {vi.mean()}"
    err = np.abs(_interior(f0)[vi] - 120.0)
    assert np.median(err) < 3.0, f"median err {np.median(err)} Hz"
    assert np.quantile(err, 0.9) < 10.0, f"p90 err {np.quantile(err, 0.9)} Hz"
    _check_cpp_agrees(x, f0)


def test_voiced_unvoiced_transitions():
    """silence | 200 Hz | silence | 140 Hz | silence — voicing decisions must
    be sane away from the boundaries."""
    sil = np.zeros(int(0.3 * FS))
    seg1, _ = synth(lambda t: np.full_like(t, 200.0), 0.4)
    seg2, _ = synth(lambda t: np.full_like(t, 140.0), 0.4)
    x = np.concatenate([sil, seg1, sil, seg2, sil])
    f0, t = estimate_py(x)

    def frames_in(t0, t1, margin=0.06):
        return (t > t0 + margin) & (t < t1 - margin)

    for t0, t1 in [(0.0, 0.3), (0.7, 1.0), (1.4, 1.8)]:
        m = frames_in(t0, t1)
        assert (f0[m] == 0).mean() > 0.9, f"silence [{t0},{t1}] voiced"
    m1 = frames_in(0.3, 0.7)
    assert (f0[m1] > 0).mean() > 0.85, "voiced seg1 missed"
    assert abs(np.median(f0[m1][f0[m1] > 0]) - 200.0) < 3.0
    m2 = frames_in(1.0, 1.4)
    assert (f0[m2] > 0).mean() > 0.85, "voiced seg2 missed"
    assert abs(np.median(f0[m2][f0[m2] > 0]) - 140.0) < 3.0
    _check_cpp_agrees(x, f0)


def test_low_male_f0():
    """80 Hz fundamental — near the f0_floor, long periods."""
    x, _ = synth(lambda t: np.full_like(t, 80.0), 1.5)
    f0, _ = estimate_py(x)
    vi = _interior(f0) > 0
    assert vi.mean() > 0.8, f"voiced recall {vi.mean()}"
    med = np.median(_interior(f0)[vi])
    assert abs(med - 80.0) < 2.0, f"median {med} Hz"
    _check_cpp_agrees(x, f0)


def test_octave_error_trap():
    """Dominant 2nd harmonic (amps 0.25/1.0/0.6/0.4) at 110 Hz — a classic
    octave-doubling trap; the estimate must stay at 110, not 220."""
    x, _ = synth(lambda t: np.full_like(t, 110.0), 1.5,
                 amps=(0.25, 1.0, 0.6, 0.4))
    f0, _ = estimate_py(x)
    vi = _interior(f0) > 0
    assert vi.mean() > 0.7, f"voiced recall {vi.mean()}"
    vals = _interior(f0)[vi]
    octave_errors = (np.abs(vals - 220.0) < 15.0).mean()
    assert octave_errors < 0.1, f"octave-error rate {octave_errors}"
    assert abs(np.median(vals) - 110.0) < 3.0, f"median {np.median(vals)}"
    _check_cpp_agrees(x, f0)


def test_fix_f0_contour_unit():
    """The published DIO FixF0Contour steps on a hand-built contour:
    octave spikes removed, short blips unvoiced, dropouts re-extended from
    band candidates."""
    from alivevc_tpu.ops.world import fix_f0_contour

    F = 60
    f0 = np.full(F, 150.0)
    f0[:10] = 0.0          # leading silence
    f0[25] = 300.0         # isolated octave spike
    f0[30:34] = 0.0        # dropout (candidates available)
    f0[50:] = 0.0          # trailing silence
    f0[54:57] = 180.0      # 3-frame blip in silence (< min_voiced_frames)
    cand = np.zeros((2, F))
    cand[0, 10:50] = 150.0  # one band tracks the truth across the voiced span
    cand[1, 25] = 300.0     # (silence has no candidates — no events to interval)
    out = fix_f0_contour(f0, cand, allowed_range=0.1)
    assert np.all(out[54:57] == 0.0), "short blip must be removed"
    assert abs(out[25] - 150.0) < 1e-9, "octave spike must be replaced via extension"
    assert np.all(out[30:34] == 150.0), "dropout must be re-filled from candidates"
    assert np.all(out[:10] == 0.0) and np.all(out[57:] == 0.0)


def test_dropout_recovery():
    """A 40 ms amplitude notch mid-vowel: raw candidate selection loses the
    frames, the contour-fixing extension must recover most of them."""
    def amp_of_t(t):
        a = np.ones_like(t)
        a[(t > 0.70) & (t < 0.74)] = 0.02
        return a

    x, _ = synth(lambda t: np.full_like(t, 130.0), 1.5, amp_of_t=amp_of_t,
                 noise_snr_db=30, seed=4)
    f0, t = estimate_py(x)
    notch = (t > 0.69) & (t < 0.75)
    vi = f0[notch] > 0
    assert vi.mean() > 0.6, f"notch voiced recall {vi.mean()}"
    if vi.any():
        err = np.abs(f0[notch][vi] - 130.0)
        assert np.median(err) < 4.0, f"notch median err {np.median(err)} Hz"
    _check_cpp_agrees(x, f0)


def test_pipeline_compute_f0_realistic():
    """The 16 kHz training-label pipeline (resample → DIO+StoneMask → 50 Hz
    frames) on a vibrato signal with noise: labels land on the true contour."""
    from alivevc_tpu.ops.world import compute_f0

    fs16 = 16000
    dur = 1.2
    n = int(fs16 * dur)
    t = np.arange(n) / fs16
    f0_true = 140.0 * (1 + 0.02 * np.sin(2 * np.pi * 4 * t))
    phase = 2 * np.pi * np.cumsum(f0_true) / fs16
    x = sum((1.0 / k) * np.sin(k * phase) for k in range(1, 5))
    x = (x / np.abs(x).max()).astype(np.float32)
    rng = np.random.default_rng(3)
    x = x + 0.02 * rng.standard_normal(n).astype(np.float32)

    f0 = compute_f0(x[None], fs16)[0]          # [n // 320]
    truth = f0_true[::320][: f0.shape[0]]
    vi = f0[5:-5] > 0
    assert vi.mean() > 0.8
    err = np.abs(f0[5:-5][vi] - truth[5:-5][vi])
    assert np.median(err) < 4.0, f"median err {np.median(err)} Hz"
