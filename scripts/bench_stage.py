"""Scan-chained micro-benchmark of individual pipeline stages on the TPU.

K chained applications inside one jit (single dispatch + fetch) so per-step
time is true device compute — see bench.py for the methodology note.

Usage: python scripts/bench_stage.py --stage ce|spec|f0|osc [--batch 8]
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
    ap.add_argument("--stage", default="ce")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=48_000)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--dtype", default="bf16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from alivevc_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from alivevc_tpu.models.content_encoder import content_encoder, init_content_encoder
    from alivevc_tpu.models.decoder import harmonic_oscillator, init_decoder
    from alivevc_tpu.models.f0_estimator import f0_estimate, init_f0_estimator
    from alivevc_tpu.ops.stft import spectrogram

    act = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    lw = 3 * args.chunk
    lf = lw // 320
    n = args.batch
    keys = jax.random.split(jax.random.PRNGKey(0), 4)

    if args.stage == "ce":
        p = init_content_encoder(keys[0])
        if args.dtype == "bf16":
            p = jax.tree_util.tree_map(lambda a: a.astype(act), p)
        x = (jax.random.normal(keys[1], (n, lf, 641)) * 0.3).astype(act)
        fn = lambda v: content_encoder(p, v)
    elif args.stage == "spec":
        x = (jax.random.normal(keys[1], (n, lw)) * 0.3).astype(act)
        fn = spectrogram
    elif args.stage == "f0":
        p = init_f0_estimator(keys[0])
        x = (jax.random.normal(keys[1], (n, lf, 641)) * 0.3).astype(jnp.float32)
        fn = lambda v: f0_estimate(p, v)
    elif args.stage == "osc":
        p = init_decoder(keys[0])["harmonic_oscillator"]
        feats = (jax.random.normal(keys[1], (n, lf, 512)) * 0.3).astype(act)
        f0 = jnp.full((n, lf, 1), 180.0)
        x = feats
        fn = lambda v: harmonic_oscillator(p, v, f0)[0]
    elif args.stage in ("posc", "cosc"):
        # Pallas oscillators: full-formant kernel vs Chebyshev recurrence
        from alivevc_tpu.kernels.oscillator_pallas import (
            harmonic_source_cheb_pallas,
            harmonic_source_pallas,
        )

        f0 = jnp.full((n, lf, 1), 180.0)
        amps = jnp.exp(
            (jax.random.normal(keys[1], (n, lf, 64)) * 0.3).astype(jnp.float32)
        )
        x = amps
        if args.stage == "posc":
            mul = jnp.arange(1, 65, dtype=jnp.float32)
            formants = f0 * mul
            fn = lambda v: harmonic_source_pallas(formants, v)
        else:
            fn = lambda v: harmonic_source_cheb_pallas(f0, v)
    elif args.stage == "filter":
        from alivevc_tpu.config import DecoderConfig
        from alivevc_tpu.models.filter_packed import filter_unet_packed

        cfg = DecoderConfig()
        p = init_decoder(keys[0])["filter"]
        if args.dtype == "bf16":
            p = jax.tree_util.tree_map(lambda a: a.astype(act), p)
        cond = (jax.random.normal(keys[2], (n, lf, cfg.channels)) * 0.3).astype(act)
        x = (jax.random.normal(keys[1], (n, lw, 1)) * 0.3).astype(act)
        fn = lambda v: filter_unet_packed(p, v, cond, cfg)
    elif args.stage.startswith("flevel"):
        # one level's packed filter block (input conv + res-block stack)
        import numpy as _np

        from alivevc_tpu.config import DecoderConfig
        from alivevc_tpu.models.filter_packed import _filter_block_dispatch, _pfac

        cfg = DecoderConfig()
        lvl = int(args.stage[len("flevel"):])
        chans = list(cfg.filter_channels)
        rates = list(cfg.filter_rates)
        lens = [lw]
        for r in rates:
            lens.append(lens[-1] // r)
        c_lvl, l_lvl = chans[lvl], lens[lvl]
        pfac = _pfac(c_lvl)
        dec = init_decoder(keys[0])
        blk = dec["filter"]["blocks"][len(chans) - 1 - lvl]
        if args.dtype == "bf16":
            blk = jax.tree_util.tree_map(lambda a: a.astype(act), blk)
        cond = (jax.random.normal(keys[2], (n, lf, cfg.channels)) * 0.3).astype(act)
        x = (jax.random.normal(keys[1], (n, l_lvl // pfac, 128 if c_lvl <= 128 else c_lvl))
             * 0.3).astype(act)
        r_film = l_lvl // lf
        fn = lambda v: _filter_block_dispatch(blk, v, cond, pfac, c_lvl, r_film,
                                              v.shape[1], cfg.filter_kernel_size)
    else:
        raise SystemExit(f"unknown stage {args.stage}")

    def scan_steps(x0, k):
        def body(carry, _):
            out = fn(carry)
            first = jax.tree_util.tree_leaves(out)[0]
            bias = (jnp.sum(first.astype(jnp.float32)) * 1e-30).astype(x0.dtype)
            return x0 + bias, ()
        carry, _ = jax.lax.scan(body, x0, None, length=k)
        return carry

    jfn = jax.jit(scan_steps, static_argnames=("k",))
    float(jnp.sum(jfn(x, 1).astype(jnp.float32)))
    float(jnp.sum(jfn(x, args.steps).astype(jnp.float32)))
    t0 = time.perf_counter()
    float(jnp.sum(jfn(x, 1).astype(jnp.float32)))
    dt0 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(jnp.sum(jfn(x, args.steps).astype(jnp.float32)))
    dt1 = time.perf_counter() - t0
    dt = (dt1 - dt0) / (args.steps - 1)
    print(f"stage={args.stage} dtype={args.dtype} batch={n}: {dt*1e3:.2f} ms/step")


if __name__ == "__main__":
    main()
