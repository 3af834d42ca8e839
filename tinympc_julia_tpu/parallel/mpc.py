"""On-device closed-loop MPC: the entire control loop (re-plan -> apply ->
simulate) as one compiled program over a batch of plants.

The reference's MPC examples round-trip through the host every control step
(solve, read u, simulate in the host language, write x0).  Here `lax.scan`
runs the whole loop on device: per step, a batched warm-started ADMM solve,
first-control extraction, and the plant update — zero host traffic until the
final trajectories come back.  This is the serving pattern for scenario
studies and domain-randomized rollouts (BASELINE.json config 5).
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..types import Cache, Problem, Settings, State
from . import batch as batch_mod
from .batch import broadcast_state
from .. import types as T


class MPCLoopResult(NamedTuple):
    xs: jax.Array      # (B, n_steps, nx)   plant states visited
    us: jax.Array      # (B, n_steps, nu)   first controls applied
    iters: jax.Array   # (B, n_steps)       ADMM iterations per solve
    solved: jax.Array  # (B, n_steps)
    state: State       # final warm-started solver workspace (B, ...)
    cache: Cache       # final cache (per-instance if adaptive-rho)


@functools.partial(jax.jit, static_argnames=("settings", "n_steps",
                                             "horizon_parallel"))
def run_mpc_loop(problem: Problem, cache: Cache, settings: Settings,
                 x0s, n_steps: int, *, Xrefs=None, Urefs=None,
                 horizon_parallel: bool = False) -> MPCLoopResult:
    """Batched closed-loop MPC for ``n_steps`` steps.

    x0s: (B, nx) initial plant states.  ``Xrefs``/``Urefs`` optionally give a
    per-step reference schedule ((n_steps, N, nx) / (n_steps, N-1, nu),
    shared across the batch — the rocket example's moving reference).  The
    plant is the problem model itself: x' = A x + B u + f.

    Solver workspaces persist across steps (the reference's warm-starting,
    SURVEY.md §5.4); solution parity with a host-driven loop is exact.
    """
    B = x0s.shape[0]
    nx, nu, N = problem.nx, problem.nu, problem.N
    dtype = x0s.dtype

    state0 = broadcast_state(T.init_state(nx, nu, N, dtype), B)
    if settings.adaptive_rho:
        cache = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a, (B,) + a.shape), cache)
        cache_batched = True
    else:
        cache_batched = False

    have_refs = Xrefs is not None
    if have_refs:
        Xrefs = jnp.asarray(Xrefs, dtype)
        Urefs = (jnp.zeros((n_steps, N - 1, nu), dtype) if Urefs is None
                 else jnp.asarray(Urefs, dtype))

    def step(carry, t):
        st, ca, x = carry
        prob = problem
        if have_refs:
            prob = problem.replace(Xref=Xrefs[t], Uref=Urefs[t])
        st = st.replace(x=st.x.at[:, 0, :].set(x))
        st, ca, sol = batch_mod.solve_batch_impl(
            prob, ca, settings, st, horizon_parallel=horizon_parallel,
            cache_batched=cache_batched)
        u0 = sol.u[:, 0, :]
        x_next = x @ problem.A.T + u0 @ problem.B.T + problem.f
        return (st, ca, x_next), (x, u0, sol.iter, sol.solved)

    (state, cache, _), (xs, us, iters, solved) = lax.scan(
        step, (state0, cache, x0s), jnp.arange(n_steps))

    # scan stacks along axis 0 (time); move batch first.
    return MPCLoopResult(
        xs=jnp.swapaxes(xs, 0, 1), us=jnp.swapaxes(us, 0, 1),
        iters=jnp.swapaxes(iters, 0, 1), solved=jnp.swapaxes(solved, 0, 1),
        state=state, cache=cache)


class CondensedMPCLoopResult(NamedTuple):
    xs: jax.Array      # (B, n_steps, nx)
    us: jax.Array      # (B, n_steps, nu)
    iters: jax.Array   # (B, n_steps)
    solved: jax.Array  # (B, n_steps)


def run_mpc_loop_condensed(problem: Problem, cache: Cache, settings: Settings,
                           x0s, n_steps: int, *, Xrefs=None, Urefs=None
                           ) -> CondensedMPCLoopResult:
    """Batched closed-loop MPC on the condensed fast path.

    Same contract as `run_mpc_loop` (warm-started solves, optional per-step
    reference schedules), but each solve uses the condensed-iteration maps
    (ops/condensed.py) with the reference contribution recomputed per step
    via `ref_backward_const` — no map rebuilds inside the loop.  Condensed
    scope applies: fixed rho (no adaptive), shared problem.
    """
    from ..ops import condensed as cond

    # Maps are built on host from concrete problem data, ref-free; refs are
    # re-injected per step through the backward constant.
    problem0 = problem.replace(Xref=jnp.zeros_like(problem.Xref),
                               Uref=jnp.zeros_like(problem.Uref))
    maps = cond.build_condensed(problem0, cache)
    return _mpc_loop_condensed(problem, cache, maps, x0s, Xrefs, Urefs,
                               settings=settings, n_steps=n_steps)


@functools.partial(jax.jit, static_argnames=("settings", "n_steps"))
def _mpc_loop_condensed(problem, cache, maps, x0s, Xrefs, Urefs, *,
                        settings: Settings, n_steps: int
                        ) -> CondensedMPCLoopResult:
    from ..ops import condensed as cond

    B = x0s.shape[0]
    nx, nu, N = problem.nx, problem.nu, problem.N
    su, sx = (N - 1) * nu, N * nx
    dtype = x0s.dtype

    have_refs = Xrefs is not None
    if have_refs:
        Xrefs = jnp.asarray(Xrefs, dtype)
        Urefs = (jnp.zeros((n_steps, N - 1, nu), dtype) if Urefs is None
                 else jnp.asarray(Urefs, dtype))

    zeros_u = jnp.zeros((su, B), dtype)
    zeros_x = jnp.zeros((sx, B), dtype)
    carry0 = cond.CondensedCarry(d=zeros_u, y=zeros_u, g=zeros_x,
                                 v=zeros_x, z=zeros_u)

    def step(carry, t):
        warm, x = carry
        if have_refs:
            Xref_t, Uref_t = Xrefs[t], Urefs[t]
        else:
            Xref_t, Uref_t = problem.Xref, problem.Uref
        d_ref = cond.ref_backward_const(problem, cache, Xref_t, Uref_t)
        _, us_plan, it, ok, warm = cond._solve_condensed_impl(
            problem, cache, maps, settings, x, warm=warm, d_ref=d_ref)
        u0 = us_plan[:, 0, :]
        x_next = x @ problem.A.T + u0 @ problem.B.T + problem.f
        return (warm, x_next), (x, u0, it, ok)

    (_, _), (xs, us, iters, solved) = lax.scan(
        step, (carry0, x0s), jnp.arange(n_steps))
    return CondensedMPCLoopResult(
        xs=jnp.swapaxes(xs, 0, 1), us=jnp.swapaxes(us, 0, 1),
        iters=jnp.swapaxes(iters, 0, 1), solved=jnp.swapaxes(solved, 0, 1))
