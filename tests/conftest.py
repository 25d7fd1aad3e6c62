"""Test env: force CPU with 8 virtual devices so mesh/collective tests run
without TPU hardware (SURVEY §4 'Distributed without a cluster').

The axon site config pins JAX_PLATFORMS=axon (single tunneled TPU chip); tests
must run on CPU for speed, full-precision fp32 matmuls (parity tolerances),
and the 8-device virtual mesh, so we override through jax.config before any
test imports jax.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
