"""Adaptive-rho: OSQP-form residuals + rho prediction + Taylor cache update.

TPU-first re-design of rho_benchmark.cpp
(/root/reference/src/codegen_src/tinympc/rho_benchmark.cpp:14-250).

The reference materializes the full stacked OSQP problem: a dense constraint
matrix A of shape ((nx+nu)(N-1), nxN + nu(N-1)) and cost P of the decision-size
square — O(N^2) memory rebuilt every 5 iterations.  Every quantity it derives
(A x, A^T y, P x, q and their infinity norms) is block-structured, so we
compute them *matrix-free* with per-stage einsums over the (N, nx)/(N-1, nu)
trajectory arrays: identical values, O(N) memory, no host round trips, and it
fuses into the surrounding ADMM iteration under jit.

Block structure being exploited (format_matrices, rho_benchmark.cpp:44-144):
  decision vec  [x_0; u_0; x_1; u_1; ...; x_{N-1}]
  constraint rows: (N-1) input-identity rows  [u_i]          with dual y_i
                 + (N-1) dynamics rows        [A B -I]       with dual g_{i+1}
  z vector      [z_i (inputs); v_{i+1} (states)]
  P blocks      diag(Q) per state (Pinf terminal), diag(R) per input
  q vector      [Q*x_i ; R*u_i]   (zero-reference form, rho_benchmark.cpp:126-143)
"""
from __future__ import annotations

import jax.numpy as jnp

from ..types import Cache, Problem, Settings, State

EPS = 1e-10  # rho_benchmark.cpp:183


def osqp_residuals(state: State, cache: Cache, problem: Problem):
    """(pri_res, dual_res, pri_norm, dual_norm) — infinity norms identical to
    compute_residuals (rho_benchmark.cpp:146-173), computed matrix-free.

    Uses the *current* iterates (x, u, vnew, znew, g, y) exactly as the solve
    loop passes them (admm.cpp:157-169).
    """
    x, u = state.x, state.u           # (N, nx), (N-1, nu)
    v, z = state.vnew, state.znew
    g, y = state.g, state.y

    A, B = problem.A, problem.B

    # --- primal: Ax vs z ---------------------------------------------------
    # input rows: u_i ; dynamics rows: A x_i + B u_i - x_{i+1}
    dyn = x[:-1] @ A.T + u @ B.T - x[1:]          # (N-1, nx)
    ax_inf = jnp.maximum(jnp.max(jnp.abs(u)), jnp.max(jnp.abs(dyn)))
    z_inf = jnp.maximum(jnp.max(jnp.abs(z)), jnp.max(jnp.abs(v[1:])))
    pri_res = jnp.maximum(jnp.max(jnp.abs(u - z)),
                          jnp.max(jnp.abs(dyn - v[1:])))
    pri_norm = jnp.maximum(ax_inf, z_inf)

    # --- dual: Px + q + A^T y ---------------------------------------------
    # P x: states get Q*x_i (Pinf @ x_{N-1} terminal); inputs get R*u_i.
    Px_states = jnp.concatenate(
        [x[:-1] * problem.Q, (cache.Pinf @ x[-1])[None, :]], axis=0)  # (N, nx)
    Px_inputs = u * problem.R                                         # (N-1, nu)

    # q: zero-reference linear cost (rho_benchmark.cpp:126-143): Q*x_i, R*u_i.
    q_states = x * problem.Q
    q_inputs = u * problem.R

    # A^T y: state x_j gets  A^T g_{j+1} [j<=N-2]  -  g_j [j>=1];
    #        input u_j gets  B^T g_{j+1}  +  y_j.
    aty_states = jnp.zeros_like(x)
    aty_states = aty_states.at[:-1].add(g[1:] @ A)
    aty_states = aty_states.at[1:].add(-g[1:])
    aty_inputs = g[1:] @ B + y

    r_dual_states = Px_states + q_states + aty_states
    r_dual_inputs = Px_inputs + q_inputs + aty_inputs
    dual_res = jnp.maximum(jnp.max(jnp.abs(r_dual_states)),
                           jnp.max(jnp.abs(r_dual_inputs)))

    px_inf = jnp.maximum(jnp.max(jnp.abs(Px_states)),
                         jnp.max(jnp.abs(Px_inputs)))
    aty_inf = jnp.maximum(jnp.max(jnp.abs(aty_states)),
                          jnp.max(jnp.abs(aty_inputs)))
    q_inf = jnp.maximum(jnp.max(jnp.abs(q_states)),
                        jnp.max(jnp.abs(q_inputs)))
    dual_norm = jnp.maximum(jnp.maximum(px_inf, aty_inf), q_inf)

    return pri_res, dual_res, pri_norm, dual_norm


def predict_rho(pri_res, dual_res, pri_norm, dual_norm, current_rho,
                settings: Settings, dtype):
    """new_rho = rho * sqrt(normalized_pri / normalized_dual), optionally
    clipped (predict_rho, rho_benchmark.cpp:175-197)."""
    eps = jnp.asarray(EPS, dtype)
    normalized_pri = pri_res / (pri_norm + eps)
    normalized_dual = dual_res / (dual_norm + eps)
    ratio = normalized_pri / (normalized_dual + eps)
    new_rho = current_rho * jnp.sqrt(ratio)
    if settings.adaptive_rho_enable_clipping:
        new_rho = jnp.clip(new_rho,
                           jnp.asarray(settings.adaptive_rho_min, dtype),
                           jnp.asarray(settings.adaptive_rho_max, dtype))
    return new_rho


def taylor_update(cache: Cache, new_rho) -> Cache:
    """First-order cache update in rho (update_matrices_with_derivatives,
    rho_benchmark.cpp:199-212).  Parity quirk: updates Kinf/Pinf/C1/C2 but NOT
    Quu_inv/AmBKt — exactly like the reference."""
    delta = new_rho - cache.rho
    return cache.replace(
        rho=new_rho,
        Kinf=cache.Kinf + delta * cache.dKinf_drho,
        Pinf=cache.Pinf + delta * cache.dPinf_drho,
        C1=cache.C1 + delta * cache.dC1_drho,
        C2=cache.C2 + delta * cache.dC2_drho,
    )


def adapt_rho(state: State, cache: Cache, problem: Problem,
              settings: Settings) -> Cache:
    """One adaptive-rho step (benchmark_rho_adaptation,
    rho_benchmark.cpp:214-250): residuals -> predicted rho -> Taylor update."""
    dtype = state.x.dtype
    pri_res, dual_res, pri_norm, dual_norm = osqp_residuals(state, cache, problem)
    new_rho = predict_rho(pri_res, dual_res, pri_norm, dual_norm, cache.rho,
                          settings, dtype)
    return taylor_update(cache, new_rho)
