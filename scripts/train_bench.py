"""Scan-chained GAN / fine-tune training-step benchmark on the TPU.

K chained optimizer steps inside one jit (single dispatch + host fetch), so
per-step time is true device compute — the tunneled platform's
block_until_ready returns at dispatch (see bench.py methodology note).

The generator forward inside the step takes the fused filter-level Pallas
kernel on the TPU backend (backward runs the packed-XLA transpose via the
kernel's custom_vjp), so this measures the real training path.

Usage: python scripts/train_bench.py [--mode gan|finetune] [--batch 4]
       [--seconds 2.4] [--steps 5]
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
    ap.add_argument("--mode", default="gan", choices=["gan", "finetune"])
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=2.4)
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()
    if args.steps < 2:
        ap.error("--steps must be >= 2 (per-step = (t_K - t_1)/(K - 1))")

    import jax
    import jax.numpy as jnp

    from alivevc_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from alivevc_tpu.models.content_encoder import init_content_encoder
    from alivevc_tpu.models.f0_estimator import init_f0_estimator

    n = args.batch
    length = int(args.seconds * 16_000) // 960 * 960
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    ce = init_content_encoder(k1)
    pe = init_f0_estimator(k2)

    t = np.arange(length) / 16_000.0
    wave = jnp.asarray(
        np.stack(
            [0.5 * np.sin(2 * np.pi * (120 + 30 * i) * t) for i in range(n)]
        ).astype(np.float32)
    )

    if args.mode == "gan":
        from alivevc_tpu.train.gan import gan_train_step, init_gan

        state = init_gan(k3)
        step_fn = gan_train_step
    else:
        from alivevc_tpu.models.decoder import init_decoder
        from alivevc_tpu.models.discriminator import init_discriminator
        from alivevc_tpu.models.voice_library import init_voice_library
        from alivevc_tpu.train.fine_tune import fine_tune_step, init_fine_tune

        kd, kdisc, kvl = jax.random.split(k3, 3)
        state = init_fine_tune(
            init_decoder(kd), init_discriminator(kdisc), init_voice_library(kvl)
        )
        step_fn = fine_tune_step

    def scan_fn(state, wave, rng, k):
        def body(carry, _):
            st, r = carry
            r, sub = jax.random.split(r)
            st, metrics = step_fn(st, ce, pe, wave, sub)
            return (st, r), metrics["loss_g"]

        (st, _), losses = jax.lax.scan(body, (state, rng), None, length=k)
        return losses[-1]

    jfn = jax.jit(scan_fn, static_argnames=("k",))
    rng = jax.random.PRNGKey(1)

    def run(k):
        return float(jfn(state, wave, rng, k))

    run(1)                       # compile K=1
    run(args.steps)              # compile K
    t0 = time.perf_counter()
    run(1)
    dt0 = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(args.steps)
    dt1 = time.perf_counter() - t0
    per_step = (dt1 - dt0) / (args.steps - 1)
    audio_s = n * length / 16_000.0
    print(
        f"mode={args.mode} batch={n} len={length} "
        f"step={per_step*1e3:.1f} ms  train-audio-s/s={audio_s/per_step:.1f}"
    )


if __name__ == "__main__":
    main()
