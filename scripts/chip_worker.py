"""Persistent on-chip job runner for kernel iteration.

The axon tunnel charges ~17-36 min for a process's FIRST cache-missing
compile, then seconds for every further program in the same process
(PERF.md ops note).  This worker keeps ONE Python process alive on the
chip and executes job files dropped into /tmp/chipjobs/, so a whole
round of kernel A/B experiments pays the startup tax once.

Usage:
    python scripts/chip_worker.py &          # leave running
    # submit: write foo.py to /tmp/chipjobs/queue/; result streams to
    # /tmp/chipjobs/out/foo.out and foo.done appears when finished.

Each job runs via exec() in a fresh namespace with `jax` imported and the
repo root on sys.path.  Jobs share the process (and its warmed compile
client) but not globals.  Drop a file named STOP to exit.
"""

from __future__ import annotations

import io
import os
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

QDIR = "/tmp/chipjobs/queue"
ODIR = "/tmp/chipjobs/out"
os.makedirs(QDIR, exist_ok=True)
os.makedirs(ODIR, exist_ok=True)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

print(f"[worker] backend={jax.default_backend()} devices={jax.devices()}",
      flush=True)

# absorb the per-process first-compile cost with a tiny novel program
t0 = time.time()
_x = jnp.ones((8, 128))
_ = jax.jit(lambda v: (v * 1.000123 + 0.5).sum())(_x).block_until_ready()
print(f"[worker] warmup compile done in {time.time() - t0:.1f}s", flush=True)


def run_job(path: str) -> None:
    name = os.path.basename(path)[:-3]
    out_path = os.path.join(ODIR, name + ".out")
    done_path = os.path.join(ODIR, name + ".done")
    with open(path) as f:
        src = f.read()
    buf = io.StringIO()

    class Tee:
        def write(self, s):
            buf.write(s)
            sys.__stdout__.write(s)
            sys.__stdout__.flush()
            # stream partial output so the driver can tail it
            with open(out_path, "w") as g:
                g.write(buf.getvalue())

        def flush(self):
            sys.__stdout__.flush()

    old = sys.stdout
    sys.stdout = Tee()
    t = time.time()
    ok = True
    try:
        # drop cached repo modules so each job sees the CURRENT source (the
        # jit/pallas caches those modules held go with them — jobs re-trace)
        for name in [m for m in sys.modules if m.startswith("alivevc_tpu")]:
            del sys.modules[name]
        ns = {"__name__": "__chipjob__", "jax": jax, "jnp": jnp}
        exec(compile(src, path, "exec"), ns)
    except BaseException:
        ok = False
        traceback.print_exc(file=sys.stdout)
    finally:
        sys.stdout = old
    with open(out_path, "w") as g:
        g.write(buf.getvalue())
    with open(done_path, "w") as g:
        g.write(f"ok={ok} dt={time.time() - t:.1f}s\n")
    print(f"[worker] job {name}: ok={ok} dt={time.time() - t:.1f}s", flush=True)


seen: set[str] = set()
print("[worker] ready; watching", QDIR, flush=True)
while True:
    if os.path.exists(os.path.join(QDIR, "STOP")):
        print("[worker] STOP", flush=True)
        break
    jobs = sorted(
        f for f in os.listdir(QDIR) if f.endswith(".py") and f not in seen
    )
    for j in jobs:
        seen.add(j)
        run_job(os.path.join(QDIR, j))
    time.sleep(1.0)
