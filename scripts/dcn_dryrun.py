"""Multi-process (DCN-path) dryrun: 2 local JAX processes, 1 coordinator.

SURVEY §4 "Distributed without a cluster": the virtual 8-device CPU mesh
exercises single-process SPMD, but the multi-host code path —
``jax.distributed.initialize`` + cross-*process* collectives over the
distributed runtime (DCN on a real pod) — is different machinery.  This
script runs it locally: each worker owns 2 virtual CPU devices, the global
mesh spans both processes, and we verify

  1. a data-parallel gradient psum whose reduction crosses the process
     boundary (every worker must see the *global* mean gradient), and
  2. the sharded-kNN retrieval merge (per-shard top-k + all_gather) with the
     library sharded across processes.

Run as coordinator (spawns the 2 workers) ::

    python scripts/dcn_dryrun.py

or as one worker of an externally managed gang ::

    python scripts/dcn_dryrun.py --process-id N --num-processes M \
        --coordinator localhost:PORT

Exercised by tests/test_parallel.py::test_dcn_multiprocess and by
``__graft_entry__.dryrun_multichip`` when ALIVEVC_DCN_DRYRUN=1.
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEVICES_PER_PROC = 2


def worker(coordinator: str, num_processes: int, process_id: int) -> None:
    # each process owns DEVICES_PER_PROC virtual CPU devices
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEVICES_PER_PROC}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from alivevc_tpu.parallel.mesh import init_distributed

    init_distributed(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes, jax.process_count()
    n_global = num_processes * DEVICES_PER_PROC
    assert len(jax.devices()) == n_global, jax.devices()

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from alivevc_tpu.ops.knn import match_features
    from alivevc_tpu.parallel.mesh import make_mesh
    from alivevc_tpu.parallel.sharded_knn import (
        pad_library_for_sharding,
        sharded_match_features,
    )

    # ---- 1. data-parallel psum across the process boundary ---------------
    mesh = make_mesh([("data", n_global)])
    dp = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    # global batch: one distinct row per global device; every process
    # constructs the same global array and hands each addressable device its
    # shard via make_array_from_callback (device-order proof)
    def put(global_np, sharding):
        return jax.make_array_from_callback(
            global_np.shape, sharding, lambda idx: global_np[idx]
        )

    rng = np.random.default_rng(0)
    xs_global = rng.standard_normal((n_global, 64)).astype(np.float32)
    w_global = rng.standard_normal((64,)).astype(np.float32)
    xs = put(xs_global, dp)
    w = put(w_global, rep)

    def loss(w, xs):
        return jnp.mean(jnp.sum((xs * w) ** 2, axis=-1))

    g = jax.jit(
        jax.grad(loss),
        in_shardings=(rep, dp),
        out_shardings=rep,
    )(w, xs)
    # the reduction crossed the process boundary iff it matches the global
    # (all-rows) gradient, which no single process holds locally
    want = 2 * np.mean(
        (xs_global * w_global)[:, None, :] * xs_global[:, None, :], axis=0
    )[0]
    got = np.asarray(jax.device_get(g))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # ---- 2. sharded-kNN merge across processes ---------------------------
    lib_mesh = make_mesh([("library", n_global)])
    lib_sh = NamedSharding(lib_mesh, P("library"))
    src = rng.standard_normal((13, 768)).astype(np.float32)
    lib = rng.standard_normal((501, 768)).astype(np.float32)
    lib_p, valid = pad_library_for_sharding(jnp.asarray(lib), n_global)
    lib_s = put(np.asarray(lib_p), lib_sh)
    valid_s = put(np.asarray(valid), NamedSharding(lib_mesh, P("library")))
    got = sharded_match_features(
        lib_mesh, jnp.asarray(src), lib_s, valid_s, k=4, chunk=64
    )
    want = match_features(jnp.asarray(src)[None], jnp.asarray(lib), 4, 0.0)[0]
    np.testing.assert_allclose(
        np.asarray(jax.device_get(got)), np.asarray(want), rtol=1e-5, atol=1e-5
    )

    print(f"dcn worker {process_id}/{num_processes}: psum + sharded kNN OK",
          flush=True)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def coordinator_main(num_processes: int, timeout: float) -> int:
    port = _free_port()
    addr = f"localhost:{port}"
    procs = []
    for pid in range(num_processes):
        env = dict(os.environ)
        # each worker re-forces its own CPU flags in worker(); scrub any
        # inherited device-count flag so they don't double up
        env.pop("XLA_FLAGS", None)
        env["JAX_PLATFORMS"] = "cpu"
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, os.path.abspath(__file__),
                    "--coordinator", addr,
                    "--num-processes", str(num_processes),
                    "--process-id", str(pid),
                ],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                env=env,
                cwd=REPO,
            )
        )
    rc = 0
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            out += "\n[coordinator] TIMEOUT"
            rc = 1
        if p.returncode:
            rc = p.returncode
        sys.stdout.write(f"--- worker {pid} (rc={p.returncode}) ---\n{out}\n")
    if rc == 0:
        print(f"dcn_dryrun: {num_processes} processes x "
              f"{DEVICES_PER_PROC} devices OK")
    return rc


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--timeout", type=float, default=300.0)
    args = ap.parse_args()
    if args.process_id is None:
        return coordinator_main(args.num_processes, args.timeout)
    worker(args.coordinator, args.num_processes, args.process_id)
    return 0


if __name__ == "__main__":
    sys.exit(main())
