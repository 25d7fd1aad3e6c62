"""Stage-prefix profiling of the offline VC program at bench shape.

Times cumulative prefixes of the convert_window pipeline as separate jitted
programs (chained-step method from bench.py: completion forced once per
timed loop by a device-side reduce + host fetch, so the ~30 ms tunnel
latency is paid once, not per step).  The difference between successive
prefixes approximates each stage's cost *inside* a full program.

Usage: python scripts/profile_stages.py [--impl pallas] [--dtype bf16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="pallas")
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=48_000)
    ap.add_argument("--library", type=int, default=100_000)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--json", default=None,
                    help="also write the stage->ms deltas as a JSON dict "
                         "consumable by mfu_report.py --times (one-command "
                         "roofline refresh)")
    args = ap.parse_args()
    if args.steps < 2:
        ap.error("--steps must be >= 2 (per-step = (t_K - t_1)/(K - 1))")

    import jax
    import jax.numpy as jnp

    from alivevc_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from alivevc_tpu.config import DecoderConfig
    from alivevc_tpu.models.content_encoder import content_encoder, init_content_encoder
    from alivevc_tpu.models.decoder import (
        decoder,
        feature_extractor,
        filter_unet,
        init_decoder,
    )
    from alivevc_tpu.models.f0_estimator import f0_estimate, init_f0_estimator
    from alivevc_tpu.nn.layers import linear
    from alivevc_tpu.ops.knn import match_features
    from alivevc_tpu.ops.pitch import apply_intonation
    from alivevc_tpu.ops.stft import spectrogram

    cfg = DecoderConfig()
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    ce = init_content_encoder(k1)
    pe = init_f0_estimator(k2)
    dec = init_decoder(k3)
    tgt = jax.random.normal(k4, (args.library, 768), jnp.float32)

    rng = np.random.default_rng(0)
    window = 3 * args.chunk
    t = np.arange(window) / 16000.0
    x = jnp.asarray(
        np.stack(
            [
                (0.4 * np.sin(2 * np.pi * rng.uniform(100, 300) * t)).astype(
                    np.float32
                )
                for _ in range(args.batch)
            ]
        )
    )

    use_bf16 = args.dtype == "bf16"
    use_pallas = args.impl == "pallas"
    act = jnp.bfloat16 if use_bf16 else jnp.float32
    ce_c = jax.tree_util.tree_map(lambda a: a.astype(act), ce) if use_bf16 else ce
    dec_c = jax.tree_util.tree_map(lambda a: a.astype(act), dec) if use_bf16 else dec

    def spec_of(w):
        w = w.astype(act)
        if use_pallas:
            from alivevc_tpu.kernels.stft_pallas import stft_magnitude_pallas

            return stft_magnitude_pallas(w)[:, :-1, :].astype(act)
        return spectrogram(w)

    def knn_of(feat, tgt):
        if use_pallas:
            from alivevc_tpu.kernels.knn_pallas import match_features_pallas_batched

            # mirror infer/offline.py: bf16 fast mode runs the match single-pass
            return match_features_pallas_batched(
                feat, tgt, k=4, alpha=0.0,
                precision="default" if use_bf16 else "highest",
            )
        return match_features(feat, tgt, k=4, alpha=0.0)

    def f0_of(spec):
        f0 = f0_estimate(pe, spec.astype(jnp.float32))
        return jax.vmap(lambda f: apply_intonation(f, 1.0, 0.0))(f0)

    def source_of(feats, f0):
        if use_pallas:
            # mirror models/decoder.py:decoder(oscillator_impl='pallas'): the
            # production offline path uses the Chebyshev-recurrence kernel
            from alivevc_tpu.kernels.oscillator_pallas import (
                harmonic_source_cheb_pallas,
            )

            amps = jnp.exp(linear(dec_c["harmonic_oscillator"]["to_amps"], feats))
            return harmonic_source_cheb_pallas(f0.astype(jnp.float32), amps,
                                               cfg.sample_rate)
        from alivevc_tpu.models.decoder import harmonic_oscillator

        src, _ = harmonic_oscillator(dec_c["harmonic_oscillator"], feats, f0)
        return src

    # cumulative prefixes; each returns something reduce-able.  NB: tgt is a
    # jit *argument* — closing over the 300 MB library 413s the remote relay.
    def p_spec(w, tgt):
        return spec_of(w)

    def p_f0(w, tgt):
        return f0_of(spec_of(w))

    def p_ce(w, tgt):
        s = spec_of(w)
        return f0_of(s), content_encoder(ce_c, s)

    def p_knn(w, tgt):
        s = spec_of(w)
        return f0_of(s), knn_of(content_encoder(ce_c, s), tgt)

    def p_fe(w, tgt):
        s = spec_of(w)
        f0 = f0_of(s)
        feat = knn_of(content_encoder(ce_c, s), tgt).astype(act)
        return f0, feature_extractor(dec_c["feature_extractor"], feat, f0)

    def p_osc(w, tgt):
        s = spec_of(w)
        f0 = f0_of(s)
        feat = knn_of(content_encoder(ce_c, s), tgt).astype(act)
        feats = feature_extractor(dec_c["feature_extractor"], feat, f0)
        return source_of(feats, f0)

    def filter_of(src, feats):
        # mirror decoder()'s impl selection (packed + fused levels on TPU)
        from alivevc_tpu.models.decoder import select_filter_impl

        if select_filter_impl(cfg, src.shape[1]) == "packed":
            from alivevc_tpu.models.filter_packed import filter_unet_packed

            return filter_unet_packed(dec_c["filter"], src, feats, cfg)[..., 0]
        return filter_unet(dec_c["filter"], src, feats, cfg)[..., 0]

    def p_full(w, tgt):
        s = spec_of(w)
        f0 = f0_of(s)
        feat = knn_of(content_encoder(ce_c, s), tgt).astype(act)
        feats = feature_extractor(dec_c["feature_extractor"], feat, f0)
        src = source_of(feats, f0)
        return filter_of(src.astype(feats.dtype), feats)

    stages = [
        ("spec", p_spec),
        ("f0", p_f0),
        ("+ce", p_ce),
        ("+knn", p_knn),
        ("+fe", p_fe),
        ("+osc", p_osc),
        ("+filter", p_full),
    ]

    def timed(fn):
        # K chained prefix applications inside ONE jit (bench.py methodology):
        # the chain bias is computed and applied in-program, so nothing
        # unjitted (and no extra dispatch) pollutes the per-step delta.
        def scan_fn(w, tgt, k):
            def body(carry, _):
                y = fn(carry, tgt)
                leaves = jax.tree_util.tree_leaves(y)
                bias = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
                return w + (bias * 1e-30).astype(w.dtype), ()

            c, _ = jax.lax.scan(body, w, None, length=k)
            return c

        jfn = jax.jit(scan_fn, static_argnames=("k",))
        float(jnp.sum(jfn(x, tgt, 1).astype(jnp.float32)))       # compile K=1
        float(jnp.sum(jfn(x, tgt, args.steps).astype(jnp.float32)))
        t0 = time.perf_counter()
        float(jnp.sum(jfn(x, tgt, 1).astype(jnp.float32)))
        dt0 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(jnp.sum(jfn(x, tgt, args.steps).astype(jnp.float32)))
        dt1 = time.perf_counter() - t0
        return (dt1 - dt0) / (args.steps - 1)

    prev = 0.0
    audio_s = args.batch * args.chunk / 16000.0
    deltas = {}
    for name, fn in stages:
        dt = timed(fn)
        deltas[name] = (dt - prev) * 1e3
        print(
            f"{name:8s} cum={dt * 1e3:8.2f} ms  delta={(dt - prev) * 1e3:8.2f} ms"
        )
        prev = dt
    print(f"kept audio per step: {audio_s:.1f} s -> {audio_s / prev:.1f} audio-s/s")

    if args.json:
        import json

        # map prefix deltas onto mfu_report.py's stage names
        table = {
            "stft+f0": round(deltas["spec"] + deltas["f0"], 2),
            "content_encoder": round(deltas["+ce"], 2),
            "knn": round(deltas["+knn"], 2),
            "feature_extractor": round(deltas["+fe"], 2),
            "oscillator": round(deltas["+osc"], 2),
            "filter": round(deltas["+filter"], 2),
        }
        with open(args.json, "w") as f:
            json.dump(table, f, indent=1)
        print(f"wrote {args.json}; run: python scripts/mfu_report.py "
              f"--times {args.json}")


if __name__ == "__main__":
    main()
