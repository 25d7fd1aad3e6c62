"""Device-mesh utilities — the runtime layer the reference never had.

The framework's scale-out model (SURVEY §2.2, BASELINE north star):

  * ``data``    — utterance/window batches, data-parallel; gradients reduced
                  by the SPMD partitioner's psum over ICI/DCN.
  * ``library`` — the voice-library frame axis for sharded kNN retrieval
                  (parallel/sharded_knn.py).
  * time-axis sharding with halo exchange for long utterances
    (parallel/halo.py).

Models are tiny (≤ ~15 M params) and always replicated.  On a multi-host pod
call ``jax.distributed.initialize`` before ``make_mesh``; tests use the
8-device virtual CPU mesh.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Sequence[tuple[str, int]] | None = None, devices=None) -> Mesh:
    """Build a mesh, e.g. ``make_mesh([('data', 2), ('library', 4)])``.

    Default: all local devices on a single ``('data',)`` axis.
    """
    if devices is None:
        devices = jax.devices()
    if axes is None:
        axes = [("data", len(devices))]
    names = tuple(n for n, _ in axes)
    shape = tuple(s for _, s in axes)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {shape} != #devices {len(devices)}")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, names)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (model params) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_along(x, mesh: Mesh, axis_name: str, array_axis: int = 0):
    """Place array ``x`` with ``array_axis`` sharded over mesh axis
    ``axis_name`` (batches over 'data', libraries over 'library')."""
    spec = [None] * x.ndim
    spec[array_axis] = axis_name
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the multi-host JAX runtime (DCN inter-host, ICI intra-slice).

    On Cloud TPU pods the arguments are auto-detected from the environment;
    pass them explicitly elsewhere.  Call before make_mesh on every host.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
