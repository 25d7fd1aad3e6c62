"""One-process film A/B across levels (the tunnel charges ~20-35 min for a
process's FIRST compile, then seconds per program — so batch everything).

Usage: python scripts/bench_film_ab_all.py [--cases 0:mxu1,1:vpu,1:mxu,...]
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
    ap.add_argument("--chunk", type=int, default=48_000)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument(
        "--cases",
        default="0:mxu1,1:vpu,1:mxu,1:mxu1,2:vpu,2:mxu,2:mxu1",
        help="comma list of level:film_impl pairs, timed in order",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from alivevc_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from alivevc_tpu.config import DecoderConfig
    from alivevc_tpu.kernels.filter_pallas import fused_filter_block
    from alivevc_tpu.models.decoder import init_decoder
    from alivevc_tpu.models.filter_packed import _pfac

    cfg = DecoderConfig()
    lw = 3 * args.chunk
    lf = lw // cfg.segment_size
    chans = list(cfg.filter_channels)
    lens = [lw]
    for r in cfg.filter_rates:
        lens.append(lens[-1] // r)
    dec = init_decoder(jax.random.PRNGKey(0))
    n = args.batch

    data = {}

    def level_data(lvl):
        if lvl not in data:
            c_lvl, l_lvl = chans[lvl], lens[lvl]
            p = _pfac(c_lvl)
            r_film = l_lvl // lf
            b = l_lvl // p
            blk = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16),
                dec["filter"]["blocks"][len(chans) - 1 - lvl],
            )
            x = (jax.random.normal(jax.random.PRNGKey(1), (n, b, p * c_lvl))
                 * 0.3).astype(jnp.bfloat16)
            cond = (jax.random.normal(jax.random.PRNGKey(2), (n, lf, cfg.channels))
                    * 0.3).astype(jnp.bfloat16)
            data[lvl] = (c_lvl, p, r_film, blk, x, cond)
        return data[lvl]

    for case in args.cases.split(","):
        parts = case.split(":")
        lvl, impl = int(parts[0]), parts[1]
        tb = int(parts[2]) if len(parts) > 2 else 0
        c_lvl, p, r_film, blk, x, cond = level_data(lvl)

        def scan_steps(x0, cc, k):
            def body(carry, _):
                out = fused_filter_block(blk, carry, cc, p, c_lvl, r_film,
                                         cfg.filter_kernel_size, "default",
                                         tb_override=tb, film_impl=impl)
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
        print(f"level={lvl} film={impl:4s} tb={tb:4d} batch={n}: "
              f"{dt*1e3:6.2f} ms/step  compile={compile_s:.0f}s", flush=True)


if __name__ == "__main__":
    main()
