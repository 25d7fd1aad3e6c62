"""A/B the fused kNN kernel's query-tile size (one process, bench shape).

The library streams from HBM once per QUERY tile (kernels/knn_pallas.py
docstring), so q_tile is the bandwidth lever: 28 800 queries / q_tile
passes x 154 MB bf16 library.  q_tile=512 -> 8.8 GB (~11 ms at 819 GB/s);
1024 halves it.  The cost is VMEM: the [q_tile, tile+k] extraction
intermediates grow linearly.

Usage: python scripts/bench_knn_qtile.py [--qtiles 512,1024,2048]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=28_800)
    ap.add_argument("--library", type=int, default=100_000)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--qtiles", default="512,1024,2048")
    ap.add_argument("--precision", default="default,high")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from alivevc_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from alivevc_tpu.kernels.knn_pallas import knn_topk_pallas

    src = jax.random.normal(jax.random.PRNGKey(5), (args.queries, 768),
                            jnp.float32)
    lib = jax.random.normal(jax.random.PRNGKey(4), (args.library, 768),
                            jnp.float32)

    for precision in args.precision.split(","):
        for q_tile in (int(q) for q in args.qtiles.split(",")):

            def scan_fn(s, l, k):
                def body(carry, _):
                    v, _i = knn_topk_pallas(carry, l, 4, q_tile=q_tile,
                                            precision=precision)
                    bias = jnp.sum(v) * 1e-30
                    return s + bias, ()
                c, _ = jax.lax.scan(body, s, None, length=k)
                return c

            jfn = jax.jit(scan_fn, static_argnames=("k",))
            try:
                t0 = time.perf_counter()
                float(jnp.sum(jfn(src, lib, 1)))
                compile_s = time.perf_counter() - t0
                float(jnp.sum(jfn(src, lib, args.steps)))
                t0 = time.perf_counter()
                float(jnp.sum(jfn(src, lib, 1)))
                dt0 = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(jnp.sum(jfn(src, lib, args.steps)))
                dt1 = time.perf_counter() - t0
                dt = (dt1 - dt0) / (args.steps - 1)
                print(f"precision={precision:8s} q_tile={q_tile:5d}: "
                      f"{dt*1e3:7.2f} ms  {args.queries/dt:,.0f} q/s  "
                      f"compile={compile_s:.0f}s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"precision={precision:8s} q_tile={q_tile:5d}: "
                      f"FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
