"""Streaming VC latency benchmark (BASELINE config #4: 20 ms-hop streaming).

Measures per-hop wall-clock latency of the jitted streaming step (the
reference's realtime design point: 60 ms chunks, 480 ms analysis window) on
the current backend, including host<->device transfer of the chunk.
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
    import numpy as np

    from alivevc_tpu.config import StreamingConfig
    from alivevc_tpu.infer.streaming import StreamingConverter
    from alivevc_tpu.models.content_encoder import init_content_encoder
    from alivevc_tpu.models.decoder import init_decoder
    from alivevc_tpu.models.f0_estimator import init_f0_estimator

    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    conv = StreamingConverter(
        init_content_encoder(k1), init_f0_estimator(k2), init_decoder(k3),
        jax.random.normal(k4, (args.library, 768)),
        StreamingConfig(chunk=args.chunk, buffer_size=args.buffer),
    )
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
    print(json.dumps({
        "hop_ms": hop_ms,
        "median_latency_ms": round(float(np.median(lat_ms)), 2),
        "p95_latency_ms": round(float(np.quantile(lat_ms, 0.95)), 2),
        "realtime_ok": bool(np.quantile(lat_ms, 0.95) < hop_ms),
        "rtf": round(float(np.median(lat_ms)) / hop_ms, 4),
    }))


if __name__ == "__main__":
    main()
