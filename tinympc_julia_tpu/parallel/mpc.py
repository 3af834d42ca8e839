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


@functools.partial(jax.jit, static_argnames=("n_steps", "horizon_parallel"))
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


def make_fused_mpc_loop(problem: Problem, cache: Cache, settings: Settings,
                        n_steps: int, *, batch_tile: int = 1024,
                        interpret: bool | None = None):
    """Build a jitted closed-loop MPC runner with every solve inside the
    VMEM-resident fused condensed kernel (ops/pallas), chained across control
    steps through the kernel's warm-start carry — the serving configuration:
    one `lax.scan` of Pallas solves, zero HBM round-trips for the solver
    state within a solve.

    Scope: box constraints, fixed rho, fixed references (baked into the
    maps), float32.  Carry semantics match run_mpc_loop_condensed exactly.
    Returns loop_fn(x0s (B, nx)) -> CondensedMPCLoopResult; hold onto it to
    reuse the compilation across calls.
    """
    from ..ops import condensed as cond
    from ..ops.pallas.condensed_kernel import make_condensed_fused_solver

    if (settings.adaptive_rho or settings.en_input_soc or settings.en_state_soc
            or settings.en_input_linear or settings.en_state_linear):
        raise ValueError("fused MPC loop supports box constraints and fixed "
                         "rho; use run_mpc_loop / run_mpc_loop_condensed")
    if settings.check_termination < 1:
        raise ValueError(
            "check_termination=0 (never check) is not supported by the fused "
            "loop; use run_mpc_loop_condensed")
    if settings.max_iter % settings.check_termination != 0:
        raise ValueError(
            "the fused loop needs check_termination to divide max_iter "
            f"(got {settings.check_termination} / {settings.max_iter})")
    nx, nu, N = problem.nx, problem.nu, problem.N
    su, sx = (N - 1) * nu, N * nx
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    maps = cond.build_condensed(problem, cache)
    kw = dict(batch_tile=batch_tile, max_iter=settings.max_iter,
              abs_pri_tol=settings.abs_pri_tol,
              abs_dua_tol=settings.abs_dua_tol,
              en_state_bound=settings.en_state_bound,
              en_input_bound=settings.en_input_bound,
              relaxation_alpha=settings.relaxation_alpha,
              check_termination=settings.check_termination,
              carry_out=True, interpret=interpret)
    # Step 0 is a genuine cold start (d = 0); later steps continue from the
    # previous step's FusedCarry.  The fused kernel's cold and warm entries
    # differ (w2 = 0 is not d = 0 when references are baked into the maps),
    # so the first step is peeled out of the scan.
    fn_cold = make_condensed_fused_solver(nx, nu, N, warm_start=False, **kw)
    fn_warm = make_condensed_fused_solver(nx, nu, N, warm_start=True, **kw)

    f32 = jnp.float32
    bounds = (problem.u_min, problem.u_max, problem.x_min, problem.x_max)

    @jax.jit
    def loop(x0s):
        def advance(x, us_plan):
            u0 = us_plan[:, 0, :]
            return u0, x @ problem.A.T + u0 @ problem.B.T + problem.f

        x = x0s.astype(f32)
        _, us_plan0, it0, ok0, warm = fn_cold(maps, cache.rho, *bounds, x)
        u0_first, x = advance(x, us_plan0)
        first = (x0s.astype(f32), u0_first, it0, ok0)

        def step(carry, t):
            warm, x = carry
            _, us_plan, it, ok, warm2 = fn_warm(maps, cache.rho, *bounds, x,
                                                warm)
            u0, x_next = advance(x, us_plan)
            return (warm2, x_next), (x, u0, it, ok)

        (_, _), (xs, us, iters, solved) = lax.scan(
            step, (warm, x), jnp.arange(n_steps - 1))
        xs, us, iters, solved = (
            jnp.concatenate([f[None], r], axis=0)
            for f, r in zip(first, (xs, us, iters, solved)))
        return (jnp.swapaxes(xs, 0, 1), jnp.swapaxes(us, 0, 1),
                jnp.swapaxes(iters, 0, 1), jnp.swapaxes(solved, 0, 1))

    def loop_fn(x0s) -> CondensedMPCLoopResult:
        xs, us, iters, solved = loop(jnp.asarray(x0s, f32))
        return CondensedMPCLoopResult(xs=xs, us=us, iters=iters,
                                      solved=solved)

    return loop_fn


def run_mpc_loop_fused(problem: Problem, cache: Cache, settings: Settings,
                       x0s, n_steps: int, *, batch_tile: int = 1024,
                       interpret: bool | None = None
                       ) -> CondensedMPCLoopResult:
    """One-shot convenience wrapper over make_fused_mpc_loop (builds + jits
    per call; hold the factory's loop_fn when calling repeatedly)."""
    loop_fn = make_fused_mpc_loop(problem, cache, settings, n_steps,
                                  batch_tile=batch_tile, interpret=interpret)
    return loop_fn(x0s)


@functools.partial(jax.jit, static_argnames=("n_steps",))
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
