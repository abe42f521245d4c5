"""Device mesh + sharding helpers.

The reference's distributed runtime is torchrun + NCCL DDP
(misc/train_utils.py:37-59). TPU-native equivalent: one SPMD program over
a jax.sharding.Mesh — batch sharded over the 'data' axis, params
replicated; XLA emits the gradient all-reduce over ICI and BatchNorm's
global-batch statistics give SyncBN semantics for free.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(data_axis: str = "data", devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (data_axis,))


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec(data_axis))


def shard_batch(batch, mesh: Mesh, data_axis: str = "data"):
    """Shard every array in a batch pytree over the data axis (dim 0)."""
    sharding = batch_sharding(mesh, data_axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, PartitionSpec())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_batch_multihost(batch, mesh: Mesh, data_axis: str = "data"):
    """Assemble a GLOBAL batch from per-host local shards.

    Multi-process SPMD (the reference's multi-node DDP analogue): every
    process loads its own slice of the global batch (DataLoader
    shard_index/num_shards mirrors DistributedSampler,
    misc/train_utils.py:142) and contributes it to a single global
    jax.Array via make_array_from_process_local_data. On a single
    process this equals shard_batch.
    """
    sharding = NamedSharding(mesh, PartitionSpec(data_axis))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), batch)
