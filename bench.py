"""End-to-end offline VC benchmark (BASELINE.json config #3 shape).

Pipeline measured per window batch: STFT → ContentEncoder ∥ F0Estimator →
kNN match against a 100k-frame library → DDSP decoder — the full conversion
path, jitted as one program, at the config #3 batch of 64 overlap-discard
windows (64 utterance chunks per device step).

Timing methodology: the tunneled axon platform adds ~35 ms of per-dispatch
overhead and its block_until_ready returns at dispatch, so K chained steps
run inside ONE jit (lax.scan) with a single host fetch; per-step time is
(t_K - t_1)/(K - 1), which cancels both the dispatch overhead and the fetch.

Prints JSON lines; the FIRST is the headline metric (audio-seconds processed
per wall-clock second on this chip).  ``vs_baseline`` compares against the
north-star RTF<0.05 target *interpreted per chip on a v5e-16* (20 audio-s/s
aggregate → 1.25 audio-s/s per chip).  A second line reports fused-kNN
queries/s against the 100k-frame library.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _timed_scan(jfn, args, k):
    """Run jfn(*args, steps) for steps in {1, k}; overhead-cancelled per-step s."""
    import jax.numpy as jnp

    float(jnp.sum(jfn(*args, 1).astype(jnp.float32)))      # compile K=1
    float(jnp.sum(jfn(*args, k).astype(jnp.float32)))      # compile K
    t0 = time.perf_counter()
    float(jnp.sum(jfn(*args, 1).astype(jnp.float32)))
    dt0 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(jnp.sum(jfn(*args, k).astype(jnp.float32)))
    dt1 = time.perf_counter() - t0
    return (dt1 - dt0) / (k - 1)


def main():
    import os

    import jax
    import jax.numpy as jnp

    from alivevc_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(os.path.dirname(os.path.abspath(__file__)))

    from alivevc_tpu.infer.offline import convert_window
    from alivevc_tpu.models.content_encoder import init_content_encoder
    from alivevc_tpu.models.decoder import init_decoder
    from alivevc_tpu.models.f0_estimator import init_f0_estimator

    chunk = 48_000           # 3 s, reference offline chunk (inference.py:35)
    window = 3 * chunk       # overlap-discard window
    batch = 64               # BASELINE config #3: 64-utterance batches
    library_frames = 100_000
    steps = 6                # chained steps inside one jit

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

    def make_scan(impl, dtype):
        def scan_fn(x, tgt, k):
            def body(carry, _):
                out = convert_window(ce, pe, dec, carry, tgt, impl=impl, dtype=dtype)
                bias = (jnp.sum(out) * 1e-30).astype(x.dtype)
                return x + bias, ()
            carry, _ = jax.lax.scan(body, x, None, length=k)
            return carry
        return jax.jit(scan_fn, static_argnames=("k",))

    times = {}
    for impl, dtype in (("xla", "fp32"), ("pallas", "fp32"), ("pallas", "bf16")):
        # one variant failing to compile must not sink the whole benchmark —
        # report the best variant that runs
        try:
            dt = _timed_scan(make_scan(impl, dtype), (x, tgt), steps)
        except Exception as e:  # noqa: BLE001
            print(f"impl={impl}/{dtype} FAILED: {e}", file=sys.stderr)
            continue
        times[(impl, dtype)] = dt
        print(f"impl={impl}/{dtype} dt={dt:.4f}s/step", file=sys.stderr)
    if not times:
        raise SystemExit("all bench variants failed")
    dt = min(times.values())

    # each window contributes `chunk` kept samples (overlap-discard), but the
    # compute cost is the full window; report *kept* audio per second — the
    # user-facing conversion throughput.
    audio_s = batch * chunk / 16_000.0
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
        f"rtf={rtf:.5f} windows/step={batch} window_s=9 library={library_frames}",
        file=sys.stderr,
    )

    # ---- kNN queries/s against the 100k library (fused Pallas kernel) ----
    from alivevc_tpu.kernels.knn_pallas import match_features_pallas

    queries = batch * (window // 320)      # content frames per step
    src = jax.random.normal(jax.random.PRNGKey(5), (queries, 768), jnp.float32)

    def make_knn_scan(precision):
        def knn_scan(src, tgt, k):
            def body(carry, _):
                out = match_features_pallas(carry, tgt, k=4, precision=precision)
                bias = jnp.sum(out) * 1e-30
                return src + bias, ()
            carry, _ = jax.lax.scan(body, src, None, length=k)
            return carry
        return jax.jit(knn_scan, static_argnames=("k",))

    knn_qps = {}
    for precision in ("highest", "high", "default"):
        try:
            dt_p = _timed_scan(make_knn_scan(precision), (src, tgt), steps)
        except Exception as e:  # noqa: BLE001
            print(f"knn/{precision} FAILED: {e}", file=sys.stderr)
            continue
        knn_qps[precision] = queries / dt_p
        print(f"knn/{precision}: dt={dt_p*1e3:.2f} ms for {queries} queries "
              f"= {queries/dt_p:,.0f} q/s", file=sys.stderr)
    qps = knn_qps.get("highest", max(knn_qps.values(), default=0.0))
    print(
        json.dumps(
            {
                "metric": "knn_queries_per_s_100k_library",
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": None,
            }
        )
    )

    # ---- accuracy budget of the bf16 fast mode vs the exact fp32 path ----
    # The headline bf16 number is licensed by measuring what the
    # approximation does to the OUTPUT: e2e mel-L1 / waveform distance
    # between pallas/bf16 and pallas/fp32 on fixed utterances, plus the
    # top-k set flip rate of the single-pass bf16 kNN at the 100k library.
    if ("pallas", "fp32") in times and ("pallas", "bf16") in times:
        from alivevc_tpu.kernels.knn_pallas import knn_topk_pallas
        from alivevc_tpu.ops.stft import log_mel_spectrogram

        xa = x[:8]
        out32 = convert_window(ce, pe, dec, xa, tgt, impl="pallas", dtype="fp32")
        out16 = convert_window(ce, pe, dec, xa, tgt, impl="pallas", dtype="bf16")
        mel_l1 = float(
            jnp.mean(jnp.abs(log_mel_spectrogram(out16) - log_mel_spectrogram(out32)))
        )
        wav_rel_l2 = float(
            jnp.linalg.norm(out16 - out32) / jnp.maximum(jnp.linalg.norm(out32), 1e-9)
        )

        # kNN flip rate: same real content features through both precisions
        from alivevc_tpu.models.content_encoder import content_encoder
        from alivevc_tpu.ops.stft import spectrogram

        feat = content_encoder(ce, spectrogram(xa)).reshape(-1, 768)
        _, idx32 = knn_topk_pallas(feat, tgt, k=4, precision="highest")
        _, idx16 = knn_topk_pallas(feat, tgt, k=4, precision="default")
        flips = jnp.any(jnp.sort(idx32, axis=1) != jnp.sort(idx16, axis=1), axis=1)
        flip_rate = float(jnp.mean(flips.astype(jnp.float32)))

        print(
            json.dumps(
                {
                    "metric": "bf16_mode_mel_l1_vs_fp32",
                    "value": round(mel_l1, 6),
                    "unit": "log-mel L1",
                    "vs_baseline": None,
                }
            )
        )
        print(
            json.dumps(
                {
                    "metric": "bf16_mode_knn_topk_flip_rate_100k",
                    "value": round(flip_rate, 6),
                    "unit": "fraction of queries",
                    "vs_baseline": None,
                }
            )
        )
        print(
            f"bf16-mode accuracy: mel_l1={mel_l1:.5f} wav_rel_l2={wav_rel_l2:.5f} "
            f"knn_flip_rate={flip_rate:.5f} (exact fp32 path: "
            f"{times[('pallas', 'fp32')]:.4f}s/step, bf16 fast path: "
            f"{times[('pallas', 'bf16')]:.4f}s/step)",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
