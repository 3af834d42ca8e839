"""Device-mesh utilities for pod-scale batched solving.

The distributed story (SURVEY.md §5.8): batch-shard MPC instances over a 1-D
``batch`` mesh axis; residual reductions and termination votes ride XLA
collectives over ICI.  No NCCL/MPI analog exists in the reference — this layer
is new, TPU-native design."""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"


def make_mesh(n_devices: int | None = None, axis_name: str = BATCH_AXIS) -> Mesh:
    """A 1-D mesh over the first ``n_devices`` devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = BATCH_AXIS) -> NamedSharding:
    """Shard the leading (instance) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_state(state, mesh: Mesh, axis_name: str = BATCH_AXIS):
    """Device_put a batched State pytree with the batch axis sharded."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), state)
