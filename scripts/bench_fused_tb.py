"""On-chip timing of the fused filter-level kernel across time-tile sizes.

Finds the per-level TB sweet spot: big tiles amortize halo recompute and per
grid-step overhead but blow up Mosaic compile time (observed >10 min at the
auto-chosen TB=3040 of level 0) and VMEM pressure.  Chained-scan timing.

Usage: python scripts/bench_fused_tb.py --level 0 --tbs 480,960,1600 [--batch 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--level", type=int, default=0)
    ap.add_argument("--tbs", default="auto")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=48_000)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from alivevc_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from alivevc_tpu.config import DecoderConfig
    from alivevc_tpu.kernels.filter_pallas import fused_filter_block, _choose_tb, \
        _stack_lookback_samples
    from alivevc_tpu.models.decoder import init_decoder
    from alivevc_tpu.models.filter_packed import _pfac

    cfg = DecoderConfig()
    lw = 3 * args.chunk
    lf = lw // cfg.segment_size
    chans = list(cfg.filter_channels)
    rates = list(cfg.filter_rates)
    lens = [lw]
    for r in rates:
        lens.append(lens[-1] // r)
    lvl = args.level
    c_lvl, l_lvl = chans[lvl], lens[lvl]
    p = _pfac(c_lvl)
    r_film = l_lvl // lf
    b = l_lvl // p

    dec = init_decoder(jax.random.PRNGKey(0))
    blk = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16),
        dec["filter"]["blocks"][len(chans) - 1 - lvl],
    )
    n = args.batch
    x = (jax.random.normal(jax.random.PRNGKey(1), (n, b, p * c_lvl)) * 0.3
         ).astype(jnp.bfloat16)
    cond = (jax.random.normal(jax.random.PRNGKey(2), (n, lf, cfg.channels)) * 0.3
            ).astype(jnp.bfloat16)

    hb = -(-_stack_lookback_samples(cfg.filter_kernel_size, 3) // p)
    auto_tb, _ = _choose_tb(b, p, r_film, p * c_lvl, hb, 2)
    tbs = ([auto_tb] if args.tbs == "auto"
           else [auto_tb if t == "auto" else int(t) for t in args.tbs.split(",")])

    for tb in tbs:
        step = 8 * (r_film // p)
        if tb % step or tb <= hb:
            print(f"level={lvl} tb={tb}: SKIP (must be a multiple of {step} "
                  f"and > halo {hb})", flush=True)
            continue

        def scan_steps(x0, cc, k, tb=tb):
            def body(carry, _):
                out = fused_filter_block(blk, carry, cc, p, c_lvl, r_film,
                                         cfg.filter_kernel_size, "default", tb)
                bias = (jnp.sum(out.astype(jnp.float32)) * 1e-30).astype(x0.dtype)
                return x0 + bias, ()
            carry, _ = jax.lax.scan(body, x0, None, length=k)
            return carry

        jfn = jax.jit(scan_steps, static_argnames=("k",))
        t0 = time.perf_counter()
        float(jnp.sum(jfn(x, cond, 1).astype(jnp.float32)))
        compile_s = time.perf_counter() - t0
        float(jnp.sum(jfn(x, cond, args.steps).astype(jnp.float32)))
        t0 = time.perf_counter()
        float(jnp.sum(jfn(x, cond, 1).astype(jnp.float32)))
        dt0 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(jnp.sum(jfn(x, cond, args.steps).astype(jnp.float32)))
        dt1 = time.perf_counter() - t0
        dt = (dt1 - dt0) / (args.steps - 1)
        print(f"level={lvl} tb={tb} (auto={auto_tb}) batch={n}: "
              f"{dt*1e3:.2f} ms/step  compile={compile_s:.0f}s", flush=True)


if __name__ == "__main__":
    main()
