"""Pod-scale sharded solving: shard_map over a device mesh with on-device
convergence votes.

Design (SURVEY.md §5.8, §7 step 7): MPC instances are independent, so the
batch axis shards cleanly; the only cross-chip communication is the
termination vote — a `psum` of each shard's still-running instance count
inside the while-loop condition, keeping all devices in lockstep without any
host round trip.  With `vote=False` each device loops independently (zero
communication; devices may exit at different trip counts)."""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..types import Cache, Problem, Settings, Solution, State
from . import batch as batch_mod
from .mesh import BATCH_AXIS


def solve_sharded(problem: Problem, cache: Cache, settings: Settings,
                  state: State, mesh: Mesh, *,
                  axis_name: str = BATCH_AXIS,
                  vote: bool = True,
                  horizon_parallel: bool = False,
                  problem_batched: bool = False,
                  cache_batched: bool = False
                  ) -> Tuple[State, Cache, Solution]:
    """Solve a batch of instances sharded across ``mesh``.

    ``state`` is batched (B, ...) with B divisible by the mesh size;
    ``problem``/``cache`` are replicated unless ``*_batched``.  Returns
    outputs with the same shardings.
    """
    n_dev = mesh.shape[axis_name]
    B = state.x.shape[0]
    if B % n_dev != 0:
        raise ValueError(f"batch {B} not divisible by mesh size {n_dev}")

    vote_fn = (lambda running: lax.psum(jnp.sum(running), axis_name)) \
        if vote else None

    def local_solve(prob, ca, st):
        return batch_mod.solve_batch_impl(
            prob, ca, settings, st,
            horizon_parallel=horizon_parallel,
            problem_batched=problem_batched,
            cache_batched=cache_batched,
            unconverged_count_fn=vote_fn)

    p_spec = P(axis_name) if problem_batched else P()
    c_spec = P(axis_name) if cache_batched else P()
    out_c_spec = P(axis_name) if (cache_batched or settings.adaptive_rho) \
        else P()

    fn = shard_map(
        local_solve, mesh=mesh,
        in_specs=(p_spec, c_spec, P(axis_name)),
        out_specs=(P(axis_name), out_c_spec, P(axis_name)),
        check_vma=False)
    return fn(problem, cache, state)


def jit_solve_sharded(problem: Problem, cache: Cache, settings: Settings,
                      state: State, mesh: Mesh, **kw):
    """jit-wrapped `solve_sharded` (compiled per mesh/settings combo)."""
    f = functools.partial(solve_sharded, mesh=mesh, settings=settings, **kw)
    return jax.jit(lambda p, c, s: f(p, cache=c, state=s))(
        problem, cache, state)
