"""End-to-end offline VC benchmark (BASELINE.json config #3 shape).

Pipeline measured per window batch: STFT → ContentEncoder ∥ F0Estimator →
kNN match against a 100k-frame library → DDSP decoder — the full conversion
path, jitted as one program, at the config #3 batch of 64 overlap-discard
windows (64 utterance chunks per device step).

Timing methodology: the tunneled axon platform adds ~35 ms of per-dispatch
overhead and its block_until_ready returns at dispatch, so K chained steps
run inside ONE jit (lax.scan) with a single host fetch; per-step time is
(t_K - t_1)/(K - 1), which cancels both the dispatch overhead and the fetch.

Output contract (driver parses the LAST JSON line in the tail): exactly one
metric is emitted as JSON — the headline audio-seconds/s of the pallas/bf16
fast mode — and it is printed BOTH as soon as it is first measured (a
conservative single-dispatch estimate, so an early timeout still records a
headline) and again, refined, at every later stage.  All secondary metrics
(fp32 exact path, kNN modes, bf16 accuracy license) print as plain text so
they can never shadow the headline in the driver's parser.  ``vs_baseline``
compares against the north-star RTF<0.05 target *interpreted per chip on a
v5e-16* (20 audio-s/s aggregate → 1.25 audio-s/s per chip).

Round-3 post-mortem (VERDICT item 1): the r3 bench compiled ≥12 programs
before its first JSON line and the driver budget expired → rc=124,
parsed=null, headline lost.  This layout front-loads the single headline
variant and makes every later stage optional-on-time.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

PER_CHIP_TARGET = 20.0 / 16.0   # RTF 0.05 → 20 audio-s/s aggregate on 16 chips


def _emit_headline(asps: float) -> None:
    print(
        json.dumps(
            {
                "metric": "offline_vc_audio_seconds_per_s_per_chip",
                "value": round(asps, 3),
                "unit": "audio-s/s",
                "vs_baseline": round(asps / PER_CHIP_TARGET, 3),
            }
        ),
        flush=True,
    )


def _run_once(jfn, args, k):
    """One timed dispatch+fetch of the K-step scan (includes tunnel overhead)."""
    import jax.numpy as jnp

    t0 = time.perf_counter()
    float(jnp.sum(jfn(*args, k).astype(jnp.float32)))
    return time.perf_counter() - t0


def _timed_scan(jfn, args, k, t1=None):
    """Overhead-cancelled per-step seconds: (t_K - t_1)/(K - 1)."""
    if t1 is None:
        _run_once(jfn, args, 1)          # compile K=1
        t1 = _run_once(jfn, args, 1)
    _run_once(jfn, args, k)              # compile K
    tk = _run_once(jfn, args, k)
    return (tk - t1) / (k - 1)


def main():
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument("--xla", action="store_true",
                    help="also time the pure-XLA fp32 sanity variant")
    ap.add_argument("--skip-secondary", action="store_true",
                    help="headline only (fastest possible run)")
    flags = ap.parse_args()

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
    audio_s = batch * chunk / 16_000.0   # kept audio per step (overlap-discard)

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

    def make_scan(impl, dtype, knn_precision=None):
        def scan_fn(x, tgt, k):
            def body(carry, _):
                out = convert_window(ce, pe, dec, carry, tgt, impl=impl,
                                     dtype=dtype, knn_precision=knn_precision)
                bias = (jnp.sum(out) * 1e-30).astype(x.dtype)
                return x + bias, ()
            carry, _ = jax.lax.scan(body, x, None, length=k)
            return carry
        return jax.jit(scan_fn, static_argnames=("k",))

    # ---- STAGE 1: headline variant (pallas/bf16), emitted ASAP ----------
    bf16 = make_scan("pallas", "bf16")
    _run_once(bf16, (x, tgt), 1)                       # compile K=1
    t1 = _run_once(bf16, (x, tgt), 1)
    # conservative provisional headline: single-step time still carries the
    # full dispatch+fetch overhead, so this UNDER-estimates throughput — but
    # it exists after one compiled program, before any further compiles.
    _emit_headline(audio_s / t1)
    dt_bf16 = _timed_scan(bf16, (x, tgt), steps, t1=t1)
    asps = audio_s / dt_bf16
    print(f"impl=pallas/bf16 dt={dt_bf16:.4f}s/step rtf={dt_bf16/audio_s:.5f} "
          f"windows/step={batch} window_s=9 library={library_frames}",
          file=sys.stderr)
    _emit_headline(asps)
    if flags.skip_secondary:
        return

    times = {("pallas", "bf16"): dt_bf16}

    # ---- STAGE 2: exact-ranking fp32 path (kNN 'high': f32-faithful) ----
    def secondary(impl, dtype, label):
        try:
            dt = _timed_scan(make_scan(impl, dtype), (x, tgt), steps)
        except Exception as e:  # noqa: BLE001
            print(f"impl={label} FAILED: {e}", file=sys.stderr)
            return
        times[(impl, dtype)] = dt
        print(f"metric offline_vc_audio_s_per_s[{label}] = "
              f"{audio_s / dt:.1f} audio-s/s ({dt:.4f} s/step)", file=sys.stderr)
        _emit_headline(asps)     # keep the headline the last JSON line

    secondary("pallas", "fp32", "pallas/fp32+knn-high")
    if flags.xla:
        secondary("xla", "fp32", "xla/fp32")

    # ---- STAGE 3: kNN queries/s against the 100k library ----------------
    try:
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

        for precision in ("default", "high", "highest"):
            dt_p = _timed_scan(make_knn_scan(precision), (src, tgt), steps)
            print(f"metric knn_queries_per_s_100k[{precision}] = "
                  f"{queries / dt_p:,.0f} q/s ({dt_p*1e3:.2f} ms for "
                  f"{queries} queries)", file=sys.stderr)
            _emit_headline(asps)
    except Exception as e:  # noqa: BLE001
        print(f"knn section FAILED: {e}", file=sys.stderr)

    # ---- STAGE 4: accuracy budget of the bf16 fast mode vs fp32 ---------
    # The bf16 headline is licensed by measuring what the approximation does
    # to the OUTPUT.  The same bounds are enforced as a pytest regression
    # gate (tests/test_bf16_license.py); this section reports the live
    # numbers next to the throughput they license.
    try:
        from alivevc_tpu.kernels.knn_pallas import knn_topk_pallas
        from alivevc_tpu.models.content_encoder import content_encoder
        from alivevc_tpu.ops.stft import log_mel_spectrogram, spectrogram

        xa = x[:8]
        out32 = convert_window(ce, pe, dec, xa, tgt, impl="pallas",
                               dtype="fp32", knn_precision="highest")
        out16 = convert_window(ce, pe, dec, xa, tgt, impl="pallas", dtype="bf16")
        mel_l1 = float(
            jnp.mean(jnp.abs(log_mel_spectrogram(out16) - log_mel_spectrogram(out32)))
        )
        wav_rel_l2 = float(
            jnp.linalg.norm(out16 - out32) / jnp.maximum(jnp.linalg.norm(out32), 1e-9)
        )
        feat = content_encoder(ce, spectrogram(xa)).reshape(-1, 768)
        _, idx32 = knn_topk_pallas(feat, tgt, k=4, precision="highest")
        _, idx16 = knn_topk_pallas(feat, tgt, k=4, precision="default")
        flips = jnp.any(jnp.sort(idx32, axis=1) != jnp.sort(idx16, axis=1), axis=1)
        flip_rate = float(jnp.mean(flips.astype(jnp.float32)))
        print(f"metric bf16_mode_mel_l1_vs_fp32 = {mel_l1:.5f} log-mel L1; "
              f"wav_rel_l2 = {wav_rel_l2:.5f}; "
              f"metric bf16_mode_knn_topk_flip_rate_100k = {flip_rate:.5f}",
              file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"accuracy section FAILED: {e}", file=sys.stderr)

    # the headline is always the last JSON line the driver sees
    _emit_headline(asps)


if __name__ == "__main__":
    main()
