"""Generate pyworld golden F0 fixtures (VERDICT round-2 gap #2).

The reference's F0 labels come from pyworld's C++ DIO+StoneMask
(/root/reference/module/common.py:113-137).  This image has no pyworld, so
our two from-scratch ports (ops/world.py numpy, native/world.cpp) are
validated against each other and synthetic truth; the actual oracle has
never run.  This script closes that loop wherever pyworld IS installed:

    python scripts/make_pyworld_golden.py            # writes tests/fixtures/

It renders the same deterministic corpus tests/test_world_golden.py uses,
labels it with real pyworld at the reference's exact settings (resample to
8 kHz, dio + stonemask, frame_period = 256/8000*1000 ms), and saves
tests/fixtures/pyworld_golden.npz.  The test activates automatically once
the fixture exists (or pyworld itself is importable at test time).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "pyworld_golden.npz",
)


def golden_corpus(sample_rate: int = 16_000, length: int = 38_400):
    """Deterministic utterances spanning the cases that matter for DIO:
    steady tones, glides, vibrato, voiced/unvoiced alternation, noise."""
    t = np.arange(length) / sample_rate
    rng = np.random.default_rng(1234)
    waves = {}

    def saw(f0):
        x = np.zeros_like(t)
        for h in range(1, int(3500 / f0)):
            x += np.sin(2 * np.pi * f0 * h * t) / h
        return 0.4 * x / np.abs(x).max()

    waves["tone_120"] = saw(120.0)
    waves["tone_235"] = saw(235.0)
    f_glide = 110.0 * 2 ** (t / t[-1])          # one octave up
    waves["glide_110_220"] = 0.4 * np.sin(
        2 * np.pi * np.cumsum(f_glide) / sample_rate
    )
    f_vib = 180.0 * (1 + 0.03 * np.sin(2 * np.pi * 5.5 * t))
    waves["vibrato_180"] = 0.4 * np.sin(2 * np.pi * np.cumsum(f_vib) / sample_rate)
    gate = (np.sin(2 * np.pi * 1.7 * t) > 0).astype(np.float64)
    waves["gated_150"] = 0.4 * gate * np.sin(2 * np.pi * 150.0 * t)
    waves["noise"] = 0.1 * rng.standard_normal(length)
    mix = saw(96.0) + 0.05 * rng.standard_normal(length)
    waves["saw_96_noisy"] = 0.4 * mix / np.abs(mix).max()
    return {k: v.astype(np.float32) for k, v in waves.items()}


def pyworld_f0(wave16: np.ndarray, sample_rate: int = 16_000) -> np.ndarray:
    """Reference pipeline: module/common.py:113-137 — resample to 8 kHz,
    dio + stonemask at frame_period 256/8000 s, return the raw 8 kHz-frame
    contour (before the 50 Hz interpolation, which is deterministic numpy
    both here and in ops/world.py)."""
    import pyworld as pw

    import jax.numpy as jnp

    from alivevc_tpu.ops.resample import resample

    w8 = np.asarray(
        resample(jnp.asarray(wave16, jnp.float32)[None], sample_rate, 8000)
    )[0].astype(np.float64)
    f0, t = pw.dio(w8, 8000, frame_period=256 / 8000 * 1000)
    f0 = pw.stonemask(w8, f0, t, 8000)
    return f0.astype(np.float32)


def main() -> int:
    try:
        import pyworld  # noqa: F401
    except ImportError:
        print("pyworld is not installed — nothing to generate.  Install it "
              "(pip install pyworld) and re-run to create the golden fixture.",
              file=sys.stderr)
        return 3
    corpus = golden_corpus()
    out = {}
    for name, wave in corpus.items():
        out[f"wave_{name}"] = wave
        out[f"f0_{name}"] = pyworld_f0(wave)
        print(f"{name}: {out[f'f0_{name}'].shape[0]} frames, "
              f"voiced={np.mean(out[f'f0_{name}'] > 0):.2f}")
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    np.savez_compressed(FIXTURE, **out)
    print(f"wrote {FIXTURE}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
