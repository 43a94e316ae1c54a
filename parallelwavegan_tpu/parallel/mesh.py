"""Mesh construction and sharding helpers for data-parallel training."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the ``data`` mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host-global numpy batch sharded over devices.

    Single-process path: device_put with a batch sharding. Multi-process
    path: assemble the global array from this host's local shard
    (DistributedSampler-equivalent: the loader already yields only this
    host's utterances).
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in batch.items()
    }


def shard_state(state, mesh: Mesh):
    """Replicate the train state across the mesh."""
    return jax.device_put(state, replicate_sharding(mesh))
