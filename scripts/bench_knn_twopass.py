"""On-chip A/B: PROTOTYPE two-pass licensed-bf16 kNN vs the production
single-pass carry kernel at the bench shape (round-5 decision data).

Usage: python scripts/bench_knn_twopass.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from alivevc_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from alivevc_tpu.kernels.knn_pallas import knn_topk_pallas
    from alivevc_tpu.kernels.knn_twopass import knn_topk_twopass

    queries, lib_rows, steps = 28_800, 100_000, 6
    src = jax.random.normal(jax.random.PRNGKey(5), (queries, 768), jnp.float32)
    lib = jax.random.normal(jax.random.PRNGKey(4), (lib_rows, 768), jnp.float32)

    def timed(fn_name, fn):
        def scan_fn(s, l, k):
            def body(carry, _):
                v, _i = fn(carry, l, 4)
                bias = jnp.sum(v) * 1e-30
                return s + bias, ()
            c, _ = jax.lax.scan(body, s, None, length=k)
            return c
        jfn = jax.jit(scan_fn, static_argnames=("k",))
        t0 = time.perf_counter()
        float(jnp.sum(jfn(src, lib, 1)))
        compile_s = time.perf_counter() - t0
        float(jnp.sum(jfn(src, lib, steps)))
        t0 = time.perf_counter()
        float(jnp.sum(jfn(src, lib, 1)))
        dt0 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(jnp.sum(jfn(src, lib, steps)))
        dt1 = time.perf_counter() - t0
        dt = (dt1 - dt0) / (steps - 1)
        print(f"{fn_name:28s}: {dt*1e3:7.2f} ms  {queries/dt:,.0f} q/s  "
              f"compile={compile_s:.0f}s", flush=True)
        return dt

    # extraction='exact' forces the carried kernel (the 'auto' route sends
    # every large-library mode to the two-pass kernels since r5)
    timed("carried default (exact extr)",
          lambda s, l, k: knn_topk_pallas(s, l, k, precision="default",
                                          extraction="exact"))
    timed("twopass (parallel + merge)",
          lambda s, l, k: knn_topk_twopass(s, l, k))
    pen = jnp.where(jnp.arange(l_shape := lib.shape[0]) < l_shape - 352,
                    0.0, -10.0).astype(jnp.float32)
    timed("twopass exact + penalty col",
          lambda s, l, k: knn_topk_twopass(s, l, k, penalty=pen))
    timed("twopass packed + valid_rows",
          lambda s, l, k: knn_topk_twopass(s, l, k,
                                           valid_rows=jnp.int32(l_shape - 352)))

    # agreement at the bench shape
    _, i1 = knn_topk_pallas(src[:2048], lib, 4, precision="default")
    _, i2 = knn_topk_twopass(src[:2048], lib, 4)
    import numpy as np

    flips = np.any(np.sort(np.asarray(i1), 1) != np.sort(np.asarray(i2), 1), 1)
    print(f"top-k set disagreement vs production default: {flips.mean():.4f}")


if __name__ == "__main__":
    main()
