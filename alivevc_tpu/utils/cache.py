"""Persistent XLA compile cache shared by every entry point.

Remote compiles through the axon relay cost minutes per program; the on-disk
cache makes repeat runs (tests, benches, the driver's gates) start in
seconds.  One helper so the thresholds stay consistent across entry points.
"""

from __future__ import annotations

import os


def enable_persistent_cache(root: str | None = None) -> str:
    """Point jax at ``<repo>/.jax_cache`` (or ``root``) and cache everything.

    Safe to call more than once; returns the cache directory used.
    """
    import jax

    if root is None:
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
    cache_dir = os.path.join(root, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
