"""Streaming VC latency benchmark (BASELINE config #4: 20 ms-hop streaming).

Measures per-hop latency of the jitted streaming step (the reference's
realtime design point: 60 ms chunks, 480 ms analysis window) two ways:

  * wall-clock per hop, including host<->device transfer and dispatch — the
    end-to-end number a realtime deployment on THIS host would see.  Through
    the axon tunnel this is dominated by ~30 ms relay dispatch latency that
    a co-located host would not pay;
  * device-compute per hop, via K hops chained inside one jit (lax.scan over
    streaming_step with a synthetic per-hop input) — the chip-side budget,
    independent of host plumbing (bench.py methodology).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chunk", type=int, default=960)
    p.add_argument("--buffer", type=int, default=8)
    p.add_argument("--library", type=int, default=512)
    p.add_argument("--hops", type=int, default=50)
    args = p.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp
    import numpy as np

    from alivevc_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from alivevc_tpu.config import StreamingConfig
    from alivevc_tpu.infer.streaming import (
        StreamingConverter,
        init_stream_state,
        streaming_step,
    )
    from alivevc_tpu.models.content_encoder import init_content_encoder
    from alivevc_tpu.models.decoder import init_decoder
    from alivevc_tpu.models.f0_estimator import init_f0_estimator

    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    ce, pe, dec = init_content_encoder(k1), init_f0_estimator(k2), init_decoder(k3)
    tgt = jax.random.normal(k4, (args.library, 768))
    cfg = StreamingConfig(chunk=args.chunk, buffer_size=args.buffer)
    conv = StreamingConverter(ce, pe, dec, tgt, cfg)
    t = np.arange(args.chunk) / 16000.0
    chunk = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)

    conv.process_chunk(chunk)  # compile
    lat = []
    for _ in range(args.hops):
        t0 = time.perf_counter()
        out = conv.process_chunk(chunk)      # np.asarray forces completion
        lat.append(time.perf_counter() - t0)
    lat_ms = np.asarray(lat) * 1000.0
    hop_ms = args.chunk / 16.0

    # ---- pipelined mode (depth 1): dispatch hop N, fetch hop N-1 ---------
    # The per-hop wall time drops from a full tunnel round trip to the
    # dispatch alone (the D2H copy of the previous hop is already done by
    # the time we ask for it), at +1 hop of algorithmic latency.
    pconv = StreamingConverter(ce, pe, dec, tgt, cfg, pipeline_depth=1)
    pconv.process_chunk(chunk)   # warm (same compiled program)
    pconv.process_chunk(chunk)
    plat = []
    for _ in range(args.hops):
        t0 = time.perf_counter()
        pconv.process_chunk(chunk)
        plat.append(time.perf_counter() - t0)
    pconv.flush()
    plat_ms = np.asarray(plat) * 1000.0

    # ---- device-compute per hop: K chained hops inside one jit -----------
    def hops_scan(state, chunk, tgt, k):
        def body(carry, _):
            st, out = streaming_step(ce, pe, dec, carry, chunk, tgt, cfg=cfg)
            return st, jnp.sum(out) * 1e-30
        st, outs = jax.lax.scan(body, state, None, length=k)
        return st.window + jnp.sum(outs)

    jfn = jax.jit(hops_scan, static_argnames=("k",))
    state0 = init_stream_state(cfg)
    cj = jnp.asarray(chunk)
    ks = max(8, args.hops)
    float(jnp.sum(jfn(state0, cj, tgt, 1)))
    float(jnp.sum(jfn(state0, cj, tgt, ks)))
    t0 = time.perf_counter()
    float(jnp.sum(jfn(state0, cj, tgt, 1)))
    dt0 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(jnp.sum(jfn(state0, cj, tgt, ks)))
    dt1 = time.perf_counter() - t0
    dev_ms = (dt1 - dt0) / (ks - 1) * 1000.0

    # headline keys = the deployable pipelined mode (depth 1, +1 hop of
    # algorithmic latency); sync_* keys = the reference-shaped synchronous
    # loop paying a full dispatch+fetch round trip per hop.
    print(json.dumps({
        "hop_ms": hop_ms,
        "pipeline_depth": 1,
        "median_latency_ms": round(float(np.median(plat_ms)), 2),
        "p95_latency_ms": round(float(np.quantile(plat_ms, 0.95)), 2),
        "sync_median_latency_ms": round(float(np.median(lat_ms)), 2),
        "sync_p95_latency_ms": round(float(np.quantile(lat_ms, 0.95)), 2),
        "device_compute_ms_per_hop": round(dev_ms, 2),
        "realtime_ok": bool(np.quantile(plat_ms, 0.95) < hop_ms),
        "sync_realtime_ok": bool(np.quantile(lat_ms, 0.95) < hop_ms),
        "device_realtime_ok": bool(dev_ms < hop_ms),
        "rtf": round(float(np.median(plat_ms)) / hop_ms, 4),
        "sync_rtf": round(float(np.median(lat_ms)) / hop_ms, 4),
        "device_rtf": round(dev_ms / hop_ms, 4),
    }))


if __name__ == "__main__":
    main()
