"""Parallel layer: batched instance solving (vmap/custom masked loop) and
pod-scale sharding (shard_map over a device mesh with psum convergence votes).
"""
from . import batch, grouped, mesh, mpc, sharded  # noqa: F401
from .batch import broadcast_state, set_x0_batch, solve_batch, solve_vmap  # noqa: F401
from .grouped import GroupedBatchSolver, expand_lanes, stack_instances  # noqa: F401
from .mesh import make_mesh, batch_sharding, shard_state  # noqa: F401
from .mpc import run_mpc_loop  # noqa: F401
from .sharded import solve_sharded  # noqa: F401
