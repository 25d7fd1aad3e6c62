"""On-chip A/B of the Chebyshev oscillator kernel's frame tile.

The kernel runs [ft, 320] tiles; at ft=8 each VPU pass touches only 3 vregs
and per-instruction issue overhead dominates (PERF.md: 6.2 ms at the bench
shape vs a ~1 ms analytic VPU floor).  Chained-scan timing (bench.py
docstring) across ft choices picks the production default.

Usage: python scripts/bench_osc.py [--batch 64] [--lf 450]
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
    ap.add_argument("--lf", type=int, default=450)   # bench shape: 144000/320
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--tiles", default="8,16,32,64")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from alivevc_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from alivevc_tpu.kernels.oscillator_pallas import harmonic_source_cheb_pallas

    n, lf, nh = args.batch, args.lf, 64
    f0 = (jax.random.uniform(jax.random.PRNGKey(0), (n, lf, 1)) * 300 + 80)
    amps = jnp.exp(
        jax.random.normal(jax.random.PRNGKey(1), (n, lf, nh)) * 0.1
    )

    for ft in (int(v) for v in args.tiles.split(",")):
        def scan_fn(f, a, k):
            def body(carry, _):
                out = harmonic_source_cheb_pallas(carry, a, frame_tile=ft)
                bias = (jnp.sum(out) * 1e-30).astype(f.dtype)
                return f + bias, ()
            carry, _ = jax.lax.scan(body, f, None, length=k)
            return carry

        jfn = jax.jit(scan_fn, static_argnames=("k",))
        t0 = time.perf_counter()
        float(jnp.sum(jfn(f0, amps, 1)))
        compile_s = time.perf_counter() - t0
        float(jnp.sum(jfn(f0, amps, args.steps)))
        t0 = time.perf_counter()
        float(jnp.sum(jfn(f0, amps, 1)))
        dt0 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(jnp.sum(jfn(f0, amps, args.steps)))
        dt1 = time.perf_counter() - t0
        dt = (dt1 - dt0) / (args.steps - 1)
        print(f"osc ft={ft:3d}: {dt*1e3:6.2f} ms/step  compile={compile_s:.0f}s",
              flush=True)


if __name__ == "__main__":
    main()
