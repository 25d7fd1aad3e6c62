"""Multi-device / multi-host scaling benchmark (BASELINE: >85% audio-s/s
efficiency 1 → 2 hosts).

Measures end-to-end offline VC throughput (the bench.py pipeline) at
increasing device counts on a ('data', 'library') mesh: windows data-parallel,
the library sharded, models replicated.  On a pod run per host:

    python scripts/scaling_bench.py --devices all --lib-shards <ici_width>

(call alivevc_tpu.parallel.mesh.init_distributed first on multi-host).  With
one chip it reports the single-device baseline; with N it reports scaling
efficiency vs the 1-device number.  Also runnable on the virtual CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_bench.py --devices 1,2,4,8 --windows-per-device 1 --seconds 3
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", default="all",
                   help="'all' or comma list of device counts to sweep")
    p.add_argument("--windows-per-device", type=int, default=4)
    p.add_argument("--seconds", type=float, default=9.0, help="window length")
    p.add_argument("--library", type=int, default=100_000)
    p.add_argument("--lib-shards", type=int, default=1,
                   help="library-axis width (devices per data row)")
    p.add_argument("--steps", type=int, default=4)
    args = p.parse_args()

    import os

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        # the axon site plugin pins the platform; config.update overrides
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp
    import numpy as np

    from alivevc_tpu.models.content_encoder import init_content_encoder
    from alivevc_tpu.models.decoder import init_decoder
    from alivevc_tpu.models.f0_estimator import init_f0_estimator
    from alivevc_tpu.parallel.distributed_vc import convert_windows_distributed
    from alivevc_tpu.parallel.mesh import make_mesh

    n_avail = len(jax.devices())
    counts = (
        [n_avail] if args.devices == "all"
        else [int(c) for c in args.devices.split(",")]
    )

    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    ce = init_content_encoder(k1)
    pe = init_f0_estimator(k2)
    dec = init_decoder(k3)
    lib = jax.random.normal(k4, (args.library, 768), jnp.float32)

    lw = int(args.seconds * 16_000) // 320 * 320
    results = {}
    for n_dev in counts:
        assert n_dev % args.lib_shards == 0
        data_rows = n_dev // args.lib_shards
        mesh = make_mesh(
            [("data", data_rows), ("library", args.lib_shards)],
            jax.devices()[:n_dev],
        )
        n_windows = data_rows * args.windows_per_device
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            (rng.standard_normal((n_windows, lw)) * 0.1).astype(np.float32)
        )

        def step(xx):
            return convert_windows_distributed(mesh, ce, pe, dec, xx, lib)

        float(jnp.sum(step(x)))  # compile
        t0 = time.perf_counter()
        cur, out = x, None
        for _ in range(args.steps):
            out = step(cur)
            cur = x + out * 1e-30
        _ = float(jnp.sum(out))
        dt = time.perf_counter() - t0
        audio_s = args.steps * n_windows * args.seconds
        asps = audio_s / dt
        results[n_dev] = asps
        eff = asps / (results[counts[0]] * n_dev / counts[0])
        print(json.dumps({
            "devices": n_dev,
            "audio_seconds_per_s": round(asps, 2),
            "per_device": round(asps / n_dev, 2),
            "scaling_efficiency": round(eff, 4),
        }))


if __name__ == "__main__":
    main()
