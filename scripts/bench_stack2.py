"""Row-rate theory probe for the fused filter kernel (r5 design, r6 lever).

The W=128 level kernels sit ~11 ms/level above their compute in an "empty
skeleton" that is flat in tile size, operand count, fe layout, film and
gelu ablations (PERF.md r5) — i.e. it scales with ROWS processed.  This
bench tests the one untested lever: lane-stacking two windows per row
(W=256, half the rows, double the conv FLOPs).  It times a SYNTHETIC
C=16/P=16 level at batch 32 (identical element count / row halving to a
2-stack of production level 0) against production level 0 at batch 64.

If `2stack` lands well under `level0` (theory says ~-5 ms), implement the
real stacking: interleave window pairs at the channel level
(out[n, b, p*2c + a*c + ch] = in[2n+a, b, p*c + ch]), block-diag conv /
up / down matrices, per-window-pair lane-stacked FiLM rows, stack once
after the wave-in conv and unstack once before the wave-out conv (plus an
unstack/restack boundary around the W=256 level 3).

Usage: python scripts/bench_stack2.py [--batch 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from alivevc_tpu.config import DecoderConfig
    from alivevc_tpu.kernels.filter_pallas import fused_filter_block
    from alivevc_tpu.models.decoder import init_decoder

    cfg = DecoderConfig()
    lf = 450
    dec = init_decoder(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    def synth_block(c):
        def conv(cin, cout, kk):
            return {
                "w": jnp.asarray(
                    rng.standard_normal((kk, cin, cout)).astype(np.float32) * 0.05
                ),
                "b": jnp.zeros((cout,), jnp.float32),
            }

        def mod(cin):
            return {
                "conv": conv(cin, cin, cfg.filter_kernel_size),
                "to_scale": {
                    "w": jnp.asarray(
                        rng.standard_normal((cfg.channels, cin)).astype(np.float32)
                        * 0.01
                    ),
                    "b": jnp.zeros((cin,), jnp.float32),
                },
                "to_shift": {
                    "w": jnp.asarray(
                        rng.standard_normal((cfg.channels, cin)).astype(np.float32)
                        * 0.01
                    ),
                    "b": jnp.zeros((cin,), jnp.float32),
                },
            }

        return {
            "input_conv": conv(c, c, 1),
            "blocks": [{"c1": mod(c), "c2": mod(c)} for _ in range(3)],
        }

    def bench(name, blk, batch, b, p, c, r_film, film):
        blk = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), blk)
        k1, k2 = jax.random.split(jax.random.PRNGKey(3))
        x = (jax.random.normal(k1, (batch, b, p * c)) * 0.3).astype(jnp.bfloat16)
        cond = (jax.random.normal(k2, (batch, lf, cfg.channels)) * 0.5).astype(
            jnp.bfloat16
        )

        def scan2(s, cc, k):
            def body(carry, _):
                out = fused_filter_block(blk, carry, cc, p, c, r_film,
                                         film_impl=film)
                return (carry + out * jnp.bfloat16(1e-30)).astype(jnp.bfloat16), ()
            cv, _ = jax.lax.scan(body, s, None, length=k)
            return cv

        jfn = jax.jit(scan2, static_argnames=("k",))
        t0 = time.perf_counter()
        float(jnp.sum(jfn(x, cond, 1).astype(jnp.float32)))
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(jnp.sum(jfn(x, cond, 1).astype(jnp.float32)))
        dt0 = time.perf_counter() - t0
        float(jnp.sum(jfn(x, cond, args.steps).astype(jnp.float32)))
        t0 = time.perf_counter()
        float(jnp.sum(jfn(x, cond, args.steps).astype(jnp.float32)))
        dt1 = time.perf_counter() - t0
        dt = (dt1 - dt0) / (args.steps - 1)
        print(f"{name:30s}: {dt*1e3:7.2f} ms (compile {comp:.0f}s)", flush=True)

    blk0 = dec["filter"]["blocks"][3]
    bench("level0 W=128 film=vpu", blk0, args.batch, 9000, 16, 8, 320, "vpu")
    bench("level0 W=128 film=mxu", blk0, args.batch, 9000, 16, 8, 320, "mxu")
    bench("2stack W=256 film=vpu", synth_block(16), args.batch // 2, 9000, 16,
          16, 320, "vpu")


if __name__ == "__main__":
    main()
