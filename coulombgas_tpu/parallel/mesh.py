"""Device mesh and sharding utilities — the distribution backbone (L0).

Replaces the reference's pmap/shard/replicate trio (src/utils.py:4-8,
src/VMC.py:8-11, main.py:263-269) with the modern JAX SPMD stack:

  * one named mesh axis ``dp`` over all devices (ICI on a TPU slice);
  * batch-carrying arrays get ``P('dp')`` on their leading axis, parameters
    and optimizer state are replicated with ``P()``;
  * compute is written once over the *global* batch and jitted with these
    shardings — XLA inserts the all-reduces (means, Fisher contractions)
    over ICI automatically.

Multi-host extension (DCN) would only change mesh construction here.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_spec", "replicated_spec", "shard_batch", "replicate", "host_gather"]

DATA_AXIS = "dp"


def make_mesh(devices: Sequence[jax.Device] | None = None, num_devices: int | None = None) -> Mesh:
    """1-D data-parallel mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_spec(mesh: Mesh) -> NamedSharding:
    """Sharding for batch-leading arrays: split axis 0 over the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_spec(mesh: Mesh) -> NamedSharding:
    """Sharding for parameters/optimizer state: fully replicated."""
    return NamedSharding(mesh, P())


def _commit(x, spec: NamedSharding):
    """Commit one array to a (possibly multi-process) sharding.

    Single process: plain device_put.  Multi-process (pod slices over DCN):
    the mesh spans non-addressable devices, so build the global jax.Array via
    ``make_array_from_callback`` — every process holds the full value locally
    (the drivers generate batch/params identically from the same PRNG seed)
    and contributes the shards it owns.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, spec)
    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, spec, lambda idx: arr[idx])


def shard_batch(pytree, mesh: Mesh):
    """Commit batch-leading arrays to the data-parallel sharding."""
    spec = batch_spec(mesh)
    return jax.tree.map(lambda x: _commit(x, spec), pytree)


def replicate(pytree, mesh: Mesh):
    """Commit a pytree to fully-replicated placement on the mesh."""
    spec = replicated_spec(mesh)
    return jax.tree.map(lambda x: _commit(x, spec), pytree)


def host_gather(pytree):
    """Fetch a (possibly sharded) pytree fully to host numpy."""
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), pytree)
