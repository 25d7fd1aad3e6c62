"""On-chip kNN kernel A/B: precision × extraction at the bench shape.

Chained-scan timing (see bench.py docstring) of knn_topk_pallas over the
100k-frame library at the config-#3 query count (28 800), for every
(precision, extraction) combination that the kernel supports.  Used to pick
the production fast path; results land in PERF.md's kNN table.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", action="store_true",
                    help="sweep (q_tile, tile) geometries instead of the "
                         "precision x extraction matrix")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from alivevc_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from alivevc_tpu.kernels.knn_pallas import knn_topk_pallas

    queries, lib, d, k, steps = 28_800, 100_000, 768, 4, 6
    src = jax.random.normal(jax.random.PRNGKey(5), (queries, d), jnp.float32)
    tgt = jax.random.normal(jax.random.PRNGKey(7), (lib, d), jnp.float32)

    def timed(precision, extraction, q_tile=512, tile=512):
        def scan_fn(src, tgt, n):
            def body(carry, _):
                v, i = knn_topk_pallas(
                    carry, tgt, k=k, precision=precision, extraction=extraction,
                    q_tile=q_tile, tile=tile,
                )
                bias = jnp.sum(v) * 1e-30 + jnp.sum(i).astype(jnp.float32) * 1e-30
                return src + bias, ()
            carry, _ = jax.lax.scan(body, src, None, length=n)
            return carry

        jfn = jax.jit(scan_fn, static_argnames=("n",))
        float(jnp.sum(jfn(src, tgt, 1)))
        float(jnp.sum(jfn(src, tgt, steps)))
        t0 = time.perf_counter()
        float(jnp.sum(jfn(src, tgt, 1)))
        dt0 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(jnp.sum(jfn(src, tgt, steps)))
        dt1 = time.perf_counter() - t0
        return (dt1 - dt0) / (steps - 1)

    if args.sweep:
        for q_tile, tile in ((512, 512), (1024, 512), (2048, 512),
                             (1024, 1024), (2048, 1024)):
            for precision in ("default",):
                try:
                    dt = timed(precision, "exact", q_tile, tile)
                except Exception as e:  # noqa: BLE001
                    print(f"q_tile={q_tile} tile={tile} {precision} FAILED: "
                          f"{type(e).__name__}", flush=True)
                    continue
                print(
                    f"knn q_tile={q_tile:5d} tile={tile:5d} {precision:8s} "
                    f"dt={dt*1e3:8.2f} ms  {queries/dt:,.0f} q/s",
                    flush=True,
                )
        return

    for precision in ("default", "high", "highest"):
        for extraction in ("packed", "exact"):
            if extraction == "packed" and precision != "default":
                continue  # packed extraction is licensed for bf16 mode only
            try:
                dt = timed(precision, extraction)
            except Exception as e:  # noqa: BLE001
                print(f"{precision}/{extraction} FAILED: {e}", flush=True)
                continue
            print(
                f"knn precision={precision:8s} extraction={extraction:6s} "
                f"dt={dt*1e3:8.2f} ms  {queries/dt:,.0f} q/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
