"""End-to-end offline VC benchmark (BASELINE.json config #3 shape).

Pipeline measured per window batch: STFT → ContentEncoder ∥ F0Estimator →
kNN match against a 100k-frame library → DDSP decoder — the full conversion
path, jitted as one program, steady-state timed after warmup.

Prints ONE JSON line: audio-seconds processed per wall-clock second on this
chip.  ``vs_baseline`` compares against the north-star RTF<0.05 target
*interpreted per chip on a v5e-16* (20 audio-s/s aggregate → 1.25 audio-s/s
per chip); >1.0 means this single chip already beats the per-chip share of
the pod target.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from alivevc_tpu.infer.offline import convert_window
    from alivevc_tpu.models.content_encoder import init_content_encoder
    from alivevc_tpu.models.decoder import init_decoder
    from alivevc_tpu.models.f0_estimator import init_f0_estimator

    chunk = 48_000           # 3 s, reference offline chunk (inference.py:35)
    window = 3 * chunk       # overlap-discard window
    batch = 8                # windows per device step
    library_frames = 100_000
    steps = 8                # timed steps

    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    ce = init_content_encoder(k1)
    pe = init_f0_estimator(k2)
    dec = init_decoder(k3)
    tgt = jax.random.normal(k4, (library_frames, 768), jnp.float32)

    rng = np.random.default_rng(0)
    t = np.arange(window) / 16000.0
    waves = np.stack(
        [
            (0.4 * np.sin(2 * np.pi * rng.uniform(100, 300) * t)).astype(np.float32)
            for _ in range(batch)
        ]
    )
    x = jnp.asarray(waves)

    def make_step(impl, dtype):
        def step(x):
            return convert_window(ce, pe, dec, x, tgt, impl=impl, dtype=dtype)
        return step

    # NOTE: on the tunneled axon platform block_until_ready() returns at
    # dispatch, not completion — completion is forced by a device-side reduce
    # fetched to the host.  Steps are chained through a tiny data dependence
    # so the measurement is throughput of `steps` sequential conversions with
    # a single final host fetch (per-step fetches would add ~30 ms tunnel
    # latency each).
    times = {}
    for impl, dtype in (("xla", "fp32"), ("pallas", "fp32"), ("pallas", "bf16")):
        step = make_step(impl, dtype)
        float(jnp.sum(step(x)))  # warmup / compile
        t0 = time.perf_counter()
        cur = x
        out = None
        for _ in range(steps):
            out = step(cur)
            cur = x + out * 1e-30
        _ = float(jnp.sum(out))
        times[(impl, dtype)] = time.perf_counter() - t0
        print(f"impl={impl}/{dtype} dt={times[(impl, dtype)]:.4f}s", file=sys.stderr)
    dt = min(times.values())

    # each window contributes `chunk` kept samples (overlap-discard), but the
    # compute cost is the full window; report *kept* audio per second — the
    # user-facing conversion throughput.
    audio_s = steps * batch * chunk / 16_000.0
    asps = audio_s / dt
    rtf = 1.0 / asps
    per_chip_target = 20.0 / 16.0  # RTF 0.05 → 20 audio-s/s on 16 chips
    print(
        json.dumps(
            {
                "metric": "offline_vc_audio_seconds_per_s_per_chip",
                "value": round(asps, 3),
                "unit": "audio-s/s",
                "vs_baseline": round(asps / per_chip_target, 3),
            }
        )
    )
    print(
        f"rtf={rtf:.5f} windows={steps * batch} window_s=9 library={library_frames}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
