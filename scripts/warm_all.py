"""Warm the persistent compile cache for every program the driver touches,
in ONE process (the tunnel charges ~20-35 min for a process's first compile,
then seconds per additional program — so the worst thing we can do is let
the driver's bench be the first to compile anything).

Runs, in order: bench.py main (full — headline + fp32 + kNN modes +
accuracy), then streaming_bench main.  Every program they compile lands in
.jax_cache, so the driver's own runs are cache-hits.

Usage: python scripts/warm_all.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    t0 = time.time()
    import bench

    sys.argv = ["bench.py"]
    bench.main()
    print(f"[warm_all] bench done at {time.time()-t0:.0f}s", file=sys.stderr,
          flush=True)

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "streaming_bench",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "streaming_bench.py"),
    )
    streaming_bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(streaming_bench)
    sys.argv = ["streaming_bench.py"]
    streaming_bench.main()
    print(f"[warm_all] streaming done at {time.time()-t0:.0f}s",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
