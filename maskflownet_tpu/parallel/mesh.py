"""Device mesh + sharding helpers for data-parallel training.

TPU-native replacement for the reference's single-host multi-GPU
``split_and_load`` + KVStore gradient aggregation (``pipeline.py:95,114``):
one 1-D ``('data',)`` mesh spanning all devices (all hosts), the batch
sharded over it with ``NamedSharding``, parameters/optimizer state
replicated, and the gradient all-reduce compiled into the jitted train step
by XLA (riding ICI within a slice and DCN across hosts).

``initialize_distributed`` must run before any other JAX call on multi-host
pods; it is a no-op in single-process settings.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host bring-up (``jax.distributed``); call once per process."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(devices=None) -> Mesh:
    """1-D data-parallel mesh over all (global) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place host-local numpy arrays as a batch sharded over 'data'.

    Single-process: a plain ``device_put`` with the sharded layout. On
    multi-host pods each process contributes its local shard via
    ``jax.make_array_from_process_local_data`` (the input pipeline already
    loads only this host's fraction -- ``data.loader`` shard arguments).
    """
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch)
