"""The ADMM engine: a pure-functional, jit/vmap-able re-design of the
reference hot loop (`solve`, /root/reference/src/codegen_src/tinympc/admm.cpp:109-207).

Update ordering reproduces the reference exactly (SURVEY.md §3.2), including
the iteration-0 quirk (slack/dual/cost updates run on the initial trajectory
before the first backward pass), the convergence semantics (solution = slack
iterates vnew/znew; on the converged iteration `v`/`z` are NOT advanced and no
backward pass runs), and residual bookkeeping (stored only on check
iterations).

Outer loop: `lax.while_loop`.  Horizon recursions: `lax.scan` by default, or a
log-depth `lax.associative_scan` formulation (ops/scans.py) for long horizons —
select with ``horizon_parallel=True``.

Under `jax.vmap`, JAX's while_loop batching rule masks the carry per-lane with
the loop predicate, so converged instances freeze exactly like the reference's
early return — per-instance iterates stay bit-identical to a one-at-a-time
solve.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..types import Cache, Problem, Settings, Solution, State
from . import projections, rho as rho_mod, scans

TINY_SOLVED = 1
TINY_UNSOLVED = 11


# ---------------------------------------------------------------------------
# Stage updates (one ADMM iteration's building blocks)
# ---------------------------------------------------------------------------

def forward_pass(state: State, problem: Problem, cache: Cache) -> State:
    """LQR-feedback rollout: u_i = -Kinf x_i - d_i;  x_{i+1} = A x_i + B u_i + f.

    Mirrors admm.cpp:25-35 plus the submodule's affine term f
    (/root/reference/src/bindings.cpp:49-56); f defaults to zeros.
    Sequential linear recurrence over the horizon -> lax.scan.
    """
    A, B, f = problem.A, problem.B, problem.f
    K = cache.Kinf

    def step(x_i, d_i):
        u_i = -(K @ x_i) - d_i
        x_next = A @ x_i + B @ u_i + f
        return x_next, (u_i, x_next)

    x0 = state.x[0]
    _, (u, x_tail) = lax.scan(step, x0, state.d)
    x = jnp.concatenate([x0[None, :], x_tail], axis=0)
    return state.replace(x=x, u=u)


def _relaxed(settings: Settings, state: State):
    """Over-relaxed iterates u_hat/x_hat (alpha=1 reduces to the reference's
    plain u/x; z/v are the previous slack iterates)."""
    a = settings.relaxation_alpha
    if a == 1.0:
        return state.u, state.x
    return a * state.u + (1.0 - a) * state.z, a * state.x + (1.0 - a) * state.v


def update_slack(state: State, problem: Problem, settings: Settings) -> State:
    """znew = u_hat + y, vnew = x_hat + g, then project onto the feasible sets
    (admm.cpp:43-59 + submodule constraint families; u_hat = u when
    relaxation_alpha == 1, the reference behavior)."""
    u_hat, x_hat = _relaxed(settings, state)
    znew = u_hat + state.y
    vnew = x_hat + state.g

    if settings.en_input_bound:
        znew = projections.project_box(znew, problem.u_min, problem.u_max)
    if settings.en_state_bound:
        vnew = projections.project_box(vnew, problem.x_min, problem.x_max)
    if settings.en_input_linear:
        znew = projections.project_halfspaces(znew, problem.Alin_u, problem.blin_u)
    if settings.en_state_linear:
        vnew = projections.project_halfspaces(vnew, problem.Alin_x, problem.blin_x)
    if settings.en_input_soc:
        znew = projections.project_cones(znew, problem.cones_u)
    if settings.en_state_soc:
        vnew = projections.project_cones(vnew, problem.cones_x)

    return state.replace(znew=znew, vnew=vnew)


def update_dual(state: State, settings: Settings = None) -> State:
    """Dual ascent: y += u_hat - znew;  g += x_hat - vnew (admm.cpp:65-69;
    u_hat = u at alpha = 1)."""
    if settings is None or settings.relaxation_alpha == 1.0:
        u_hat, x_hat = state.u, state.x
    else:
        u_hat, x_hat = _relaxed(settings, state)
    return state.replace(
        y=state.y + u_hat - state.znew,
        g=state.g + x_hat - state.vnew,
    )


def update_linear_cost(state: State, problem: Problem, cache: Cache) -> State:
    """r, q, p_N updates (admm.cpp:75-83).

    p_N = -(Xref_N^T Pinf)^T - rho (vnew_N - g_N): the reference computes the
    row-product Xref^T . Pinf, i.e. Pinf^T @ Xref_N elementwise — we keep the
    transpose (Pinf is only symmetric up to roundoff) for iterate parity.
    """
    rho = cache.rho
    r = -(problem.Uref * problem.R) - rho * (state.znew - state.y)
    q = -(problem.Xref * problem.Q) - rho * (state.vnew - state.g)
    p_N = -(cache.Pinf.T @ problem.Xref[-1]) - rho * (state.vnew[-1] - state.g[-1])
    p = state.p.at[-1].set(p_N)
    return state.replace(r=r, q=q, p=p)


def backward_pass(state: State, problem: Problem, cache: Cache,
                  *, horizon_parallel: bool = False) -> State:
    """Linear-term Riccati backward recursion (admm.cpp:13-20):
        d_i = Quu_inv (B^T p_{i+1} + r_i)
        p_i = q_i + AmBKt p_{i+1} - Kinf^T r_i
    """
    if horizon_parallel:
        return scans.backward_pass_assoc(state, problem, cache)

    B = problem.B
    Quu_inv, AmBKt, KinfT = cache.Quu_inv, cache.AmBKt, cache.Kinf.T

    def step(p_next, inp):
        q_i, r_i = inp
        d_i = Quu_inv @ (B.T @ p_next + r_i)
        p_i = q_i + AmBKt @ p_next - KinfT @ r_i
        return p_i, (d_i, p_i)

    _, (d, p_head) = lax.scan(step, state.p[-1], (state.q[:-1], state.r),
                              reverse=True)
    p = jnp.concatenate([p_head, state.p[-1][None, :]], axis=0)
    return state.replace(d=d, p=p)


def compute_residuals(state: State, cache: Cache):
    """The four infinity-norm residuals of termination_condition
    (admm.cpp:93-96)."""
    pri_state = jnp.max(jnp.abs(state.x - state.vnew))
    dua_state = jnp.max(jnp.abs(state.v - state.vnew)) * cache.rho
    pri_input = jnp.max(jnp.abs(state.u - state.znew))
    dua_input = jnp.max(jnp.abs(state.z - state.znew)) * cache.rho
    return pri_state, pri_input, dua_state, dua_input


# ---------------------------------------------------------------------------
# The solve loop
# ---------------------------------------------------------------------------

def _tree_select(pred, on_true, on_false):
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(pred, a, b), on_true, on_false)


def make_loop_fns(problem: Problem, settings: Settings, *,
                  horizon_parallel: bool = False, dtype=None,
                  chunk_maps=None):
    """Build (cond_fn, body_fn) for the ADMM while-loop over the carry
    ``(state, cache, z_prev, v_prev, converged, i)``.

    Exposed so the parallel layer can reuse the exact single-instance
    iteration inside custom batched/sharded loops (parallel/batch.py,
    parallel/sharded.py) without duplicating the reference semantics.

    ``chunk_maps`` (ops/scans.ChunkMaps) switches the horizon recursions to
    the chunked-condensation form — the long-horizon fast path (N/C serial
    steps of big matmuls; same values up to float reassociation).
    """
    if chunk_maps is not None and settings.adaptive_rho:
        # The chunk maps bake the setup-time Kinf/Quu_inv/AmBKt into
        # T1c/Pp/Pc; adaptive-rho moves those terms every 5 iterations, so
        # the chunked recursions would silently run a stale gain.
        raise ValueError("chunk_maps are incompatible with adaptive_rho "
                         "(the maps bake the setup-time gains); use the "
                         "standard path")
    dtype = dtype or problem.A.dtype
    pri_tol = jnp.asarray(settings.abs_pri_tol, dtype)
    dua_tol = jnp.asarray(settings.abs_dua_tol, dtype)

    def cond_fn(carry):
        _, _, _, _, converged, i = carry
        return jnp.logical_and(i < settings.max_iter,
                               jnp.logical_not(converged))

    def body_fn(carry):
        st, ca, z_prev, v_prev, _, i = carry

        if chunk_maps is not None:
            st = scans.forward_pass_chunked(st, problem, ca, chunk_maps)
        elif horizon_parallel:
            st = scans.forward_pass_assoc(st, problem, ca)
        else:
            st = forward_pass(st, problem, ca)
        st = update_slack(st, problem, settings)
        st = update_dual(st, settings)
        st = update_linear_cost(st, problem, ca)
        st = st.replace(iter=st.iter + 1)

        if settings.adaptive_rho:
            # Reference gates on the 0-based loop counter: i > 0 && i % 5 == 0
            # (admm.cpp:156), updating the cache via OSQP-form residuals + a
            # first-order Taylor expansion in rho (rho_benchmark.cpp:214-250).
            do_update = jnp.logical_and(i > 0, i % 5 == 0)
            if settings.adaptive_rho_rebuild:
                # Exact on-device Riccati rebuild (extension, ops/rho.py
                # rebuild_update).  lax.cond so the nested fixed point only
                # runs on update iterations — under parallel/batch.py's loop
                # the counter i is unbatched, so this stays a real branch.
                ca = lax.cond(
                    do_update,
                    lambda args: rho_mod.adapt_rho_rebuild(*args, problem,
                                                           settings),
                    lambda args: args[1], (st, ca))
            else:
                ca_new = rho_mod.adapt_rho(st, ca, problem, settings)
                ca = _tree_select(do_update, ca_new, ca)

        z_prev = st.znew
        v_prev = st.vnew

        # Termination check (admm.cpp:89-107): only on iterations where
        # iter % check_termination == 0; residuals are stored only then.
        if settings.check_termination > 0:
            check = (st.iter % settings.check_termination) == 0
            pri_s, pri_i, dua_s, dua_i = compute_residuals(st, ca)
            st = st.replace(
                primal_residual_state=jnp.where(check, pri_s,
                                                st.primal_residual_state),
                primal_residual_input=jnp.where(check, pri_i,
                                                st.primal_residual_input),
                dual_residual_state=jnp.where(check, dua_s,
                                              st.dual_residual_state),
                dual_residual_input=jnp.where(check, dua_i,
                                              st.dual_residual_input),
            )
            converged = jnp.logical_and(
                check,
                (pri_s < pri_tol) & (pri_i < pri_tol)
                & (dua_s < dua_tol) & (dua_i < dua_tol),
            )
        else:
            converged = jnp.asarray(False)

        st = st.replace(status=jnp.where(converged,
                                         jnp.asarray(TINY_SOLVED, jnp.int32),
                                         st.status))

        # When NOT converged: commit slack (v = vnew, z = znew) and run the
        # backward pass (admm.cpp:195-199).  On the converged iteration the
        # reference returns first — leave v/z/p/d untouched for exact
        # warm-start parity.
        st_committed = st.replace(v=st.vnew, z=st.znew)
        if chunk_maps is not None:
            st_next = scans.backward_pass_chunked(st_committed, problem, ca,
                                                  chunk_maps)
        else:
            st_next = backward_pass(st_committed, problem, ca,
                                    horizon_parallel=horizon_parallel)
        st = _tree_select(converged, st, st_next)

        return (st, ca, z_prev, v_prev, converged, i + 1)

    return cond_fn, body_fn


def init_carry(state: State, cache: Cache):
    """Initial while-loop carry (solve() preamble, admm.cpp:112-127)."""
    state = state.replace(status=jnp.asarray(TINY_UNSOLVED, jnp.int32),
                          iter=jnp.zeros((), jnp.int32))
    return (state, cache, state.znew, state.vnew,
            jnp.asarray(False), jnp.zeros((), jnp.int32))


def finalize(carry) -> Tuple[State, Cache, Solution]:
    state, cache, _, _, converged, _ = carry
    solution = Solution(
        iter=state.iter,
        solved=converged.astype(jnp.int32),
        x=state.vnew,
        u=state.znew,
    )
    return state, cache, solution


def solve_impl(problem: Problem, cache: Cache, settings: Settings,
               state: State, *, horizon_parallel: bool = False,
               chunk_maps=None) -> Tuple[State, Cache, Solution]:
    """Unjitted solve — compose with vmap/shard_map; prefer `solve` directly.

    Traced under full float32 matmul precision: the TPU MXU's default
    bf16-input passes inject ~1e-2 relative noise into the Riccati
    recursions, stalling ADMM dual residuals above the 1e-3 tolerances.
    The matmuls here are tiny (nx, nu <= 128 = one MXU tile), so HIGHEST
    precision costs little and restores CPU-equivalent convergence.
    """
    with jax.default_matmul_precision("highest"):
        cond_fn, body_fn = make_loop_fns(problem, settings,
                                         horizon_parallel=horizon_parallel,
                                         dtype=state.x.dtype,
                                         chunk_maps=chunk_maps)
        carry = lax.while_loop(cond_fn, body_fn, init_carry(state, cache))
        return finalize(carry)


@functools.partial(jax.jit, static_argnames=("horizon_parallel",))
def solve(problem: Problem, cache: Cache, settings: Settings, state: State,
          *, horizon_parallel: bool = False, chunk_maps=None
          ) -> Tuple[State, Cache, Solution]:
    """One full ADMM solve.  Pure: returns the advanced (state, cache) plus the
    Solution; callers persist state/cache for warm starts (the reference's
    singleton workspace persistence, SURVEY.md §5.4).

    Note: `settings` is a pytree argument whose flags/loop bounds are static
    metadata (they select compiled control flow and recompile on change) while
    tolerances and rho limits are traced leaves — changing them re-runs the
    same compiled program (types.py contract).
    """
    return solve_impl(problem, cache, settings, state,
                      horizon_parallel=horizon_parallel,
                      chunk_maps=chunk_maps)
