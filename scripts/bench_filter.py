"""Micro-benchmark of the filter U-Net alone (the step-time hot spot).

Times variants to locate where the time goes:
  full    — filter_unet as used in the pipeline
  nofilm  — FiLM scale/shift replaced by constants (isolates the interp cost)
  plain   — lane-packed convs disabled (plain conv_general_dilated)
  packed  — fully lane-dense packed-layout implementation (if present)

Chained-dependence timing with one final host fetch (the axon tunnel's
block_until_ready returns at dispatch — see utils/profiling.py).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="full")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=48_000)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--dtype", default="bf16")
    args = ap.parse_args()

    if args.variant == "plain":
        # force the unpacked conv path even on TPU
        os.environ["ALIVEVC_FORCE_PLAIN"] = "1"

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from alivevc_tpu.config import DecoderConfig
    from alivevc_tpu.models.decoder import filter_unet, init_decoder

    cfg = DecoderConfig()
    act = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    dec = init_decoder(jax.random.PRNGKey(0))
    fp = dec["filter"]
    if args.dtype == "bf16":
        fp = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, fp
        )

    lw = 3 * args.chunk
    lf = lw // cfg.segment_size
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    source = (jax.random.normal(k1, (args.batch, lw, 1)) * 0.1).astype(act)
    c = (jax.random.normal(k2, (args.batch, lf, cfg.channels)) * 0.5).astype(act)

    if args.variant == "nofilm":
        # zero the FiLM projections: scale=1, shift=0 regardless of c; the
        # interpolation of constant tensors should be folded away by XLA
        def zero_film(p):
            import jax.numpy as jnp

            def z(d):
                return {
                    "w": jnp.zeros_like(d["w"]),
                    "b": jnp.zeros_like(d["b"]),
                }

            out = dict(p)
            if "to_scale" in p:
                out["to_scale"] = z(p["to_scale"])
                out["to_shift"] = z(p["to_shift"])
            for k, v in p.items():
                if isinstance(v, dict) and "to_scale" not in p:
                    pass
            return out

        def walk(p):
            if isinstance(p, dict):
                if "to_scale" in p:
                    p = zero_film(p)
                return {k: walk(v) for k, v in p.items()}
            if isinstance(p, list):
                return [walk(v) for v in p]
            return p

        fp = walk(fp)

    if args.variant == "glue":
        # time the U-Net *glue* alone (in/out convs, down/up rate convs, mid
        # conv, skip adds): stub the per-level res-block stacks to identity
        import alivevc_tpu.models.filter_packed as fpk

        fpk._filter_block_dispatch = (
            lambda pp, x, cond, p, c, r, b_out, k: x
        )

        def run(s, cc):
            return fpk.filter_unet_packed(fp, s, cc, cfg)
    elif args.variant == "packed":
        from alivevc_tpu.models.filter_packed import filter_unet_packed

        def run(s, cc):
            return filter_unet_packed(fp, s, cc, cfg)
    else:
        def run(s, cc):
            return filter_unet(fp, s, cc, cfg)

    # K chained steps inside ONE jit (lax.scan): a single dispatch + a single
    # host fetch, so the per-dispatch tunnel overhead (tens of ms through the
    # axon relay) is amortized away and ms/step is true device compute.
    def scan_steps(s, cc, k):
        def body(carry, _):
            out = run(carry, cc)
            bias = (jnp.sum(out.astype(jnp.float32)) * 1e-30).astype(act)
            return s + bias, ()
        carry, _ = jax.lax.scan(body, s, None, length=k)
        return carry

    jfn = jax.jit(scan_steps, static_argnames=("k",))

    float(jnp.sum(jfn(source, c, 1).astype(jnp.float32)))   # compile small
    float(jnp.sum(jfn(source, c, args.steps).astype(jnp.float32)))  # compile big
    t0 = time.perf_counter()
    out = jfn(source, c, args.steps)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    dt1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = jfn(source, c, 1)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    dt0 = time.perf_counter() - t0
    dt = (dt1 - dt0) / (args.steps - 1)   # overhead-cancelled per-step time
    print(f"variant={args.variant} dtype={args.dtype} batch={args.batch} "
          f"lw={lw}: {dt*1e3:.2f} ms/step  (K={args.steps}: {dt1*1e3:.1f} ms, "
          f"K=1: {dt0*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
