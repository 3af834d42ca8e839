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

# Termination-residual controller (extension) tuning: deadband factor below
# which updates are skipped and per-update step cap (OSQP's adaptive-rho
# anti-oscillation mechanism).
TERM_DEADBAND = 5.0
TERM_MAX_STEP = 10.0


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


def termination_controller(pri, dual, rho, settings: Settings, dtype, *,
                           rho_center=None):
    """The residual-level EXTENSION controller shared by every path
    (standard / condensed / fused): predict rho from the solver's own
    termination residuals (admm.cpp:93-96 values), each normalized by ITS
    OWN tolerance:

        ratio   = (pri / abs_pri_tol) / (dual / abs_dua_tol)
        new_rho = rho * sqrt(ratio)          (clipped like predict_rho)

    ``pri``/``dual``/``rho`` may be scalars (standard path) or per-lane
    vectors (condensed path).  ``rho_center`` (the sensitivity/Taylor
    expansion center) enables the Settings.adaptive_rho_taylor_trust clip —
    the final word, protecting first-order caches from predictions outside
    their measured validity radius."""
    eps = jnp.asarray(EPS, dtype)
    pri_tol = jnp.asarray(settings.abs_pri_tol, dtype)
    dua_tol = jnp.asarray(settings.abs_dua_tol, dtype)
    ratio = (pri / pri_tol) / (dual / dua_tol + eps)
    factor = jnp.sqrt(ratio)
    # OSQP-style deadband + step cap (anti-oscillation: near convergence the
    # dual residual vanishes first, which would otherwise send rho jumping
    # every update): apply only moves larger than TERM_DEADBAND, capped at
    # TERM_MAX_STEP per update.
    factor = jnp.clip(factor, 1.0 / TERM_MAX_STEP, TERM_MAX_STEP)
    apply = jnp.logical_or(factor > TERM_DEADBAND,
                           factor < 1.0 / TERM_DEADBAND)
    new_rho = jnp.where(apply, rho * factor, rho)
    if settings.adaptive_rho_enable_clipping:
        new_rho = jnp.clip(new_rho,
                           jnp.asarray(settings.adaptive_rho_min, dtype),
                           jnp.asarray(settings.adaptive_rho_max, dtype))
    if rho_center is not None:
        trust = jnp.asarray(settings.adaptive_rho_taylor_trust, dtype)
        new_rho = jnp.clip(new_rho, rho_center - trust, rho_center + trust)
    return new_rho


def predict_rho_termination(state: State, cache: Cache, settings: Settings,
                            dtype, rho_center=None):
    """termination_controller on the standard path's State (see there for
    semantics; rationale measured in docs/DESIGN.md §4: the reference's
    OSQP-form controller is structurally decay-biased on regulation
    problems — its dual residual contains cost terms that never vanish at
    convergence, so rho only ever falls.  Normalizing each termination
    residual by its own tolerance directly targets the termination
    condition: rho rises when the primal check lags (mis-set-low rho) and
    falls when the dual check lags (mis-set-high rho))."""
    rho = cache.rho
    pri = jnp.maximum(jnp.max(jnp.abs(state.x - state.vnew)),
                      jnp.max(jnp.abs(state.u - state.znew)))
    dual = rho * jnp.maximum(jnp.max(jnp.abs(state.v - state.vnew)),
                             jnp.max(jnp.abs(state.z - state.znew)))
    return termination_controller(pri, dual, rho, settings, dtype,
                                  rho_center=rho_center)


def _predicted_rho(state: State, cache: Cache, problem: Problem,
                   settings: Settings, dtype):
    """Dispatch on the controller setting (static)."""
    if settings.adaptive_rho_controller == "termination":
        return predict_rho_termination(state, cache, settings, dtype,
                                       rho_center=problem.rho_setup)
    if settings.adaptive_rho_controller != "osqp":
        raise ValueError("adaptive_rho_controller must be 'osqp' or "
                         f"'termination', got "
                         f"{settings.adaptive_rho_controller!r}")
    pri_res, dual_res, pri_norm, dual_norm = osqp_residuals(state, cache,
                                                            problem)
    return predict_rho(pri_res, dual_res, pri_norm, dual_norm, cache.rho,
                       settings, dtype)


def adapt_rho(state: State, cache: Cache, problem: Problem,
              settings: Settings) -> Cache:
    """One adaptive-rho step (benchmark_rho_adaptation,
    rho_benchmark.cpp:214-250): residuals -> predicted rho -> Taylor update."""
    dtype = state.x.dtype
    new_rho = _predicted_rho(state, cache, problem, settings, dtype)
    return taylor_update(cache, new_rho)


def rebuild_update(cache: Cache, problem: Problem, new_rho, *,
                   max_iter: int = 1000, tol: float = 1e-5,
                   warm: bool = True) -> Cache:
    """EXACT cache update at ``new_rho`` (extension behind
    Settings.adaptive_rho_rebuild; the Taylor path stays reference-exact).

    Re-runs the Riccati fixed point — the on-device batched analog of
    re-calling tiny_precompute_and_set_cache
    (/root/reference/src/codegen_src/tinympc/tiny_api.cpp:124-190) — at the
    same double-rho-fold semantics the setup used (user cost
    ``problem.Q - problem.rho_setup`` plus 2*new_rho), i.e. the exact
    function whose first-order linearization the reference's Taylor update
    extrapolates (rho_benchmark.cpp:199-212).  Unlike the Taylor update it
    also refreshes ``Quu_inv``/``AmBKt`` (and keeps C1/C2 in sync): the
    rebuilt cache is self-consistent, so adaptation works arbitrarily far
    from the expansion center where the measured Taylor radius is |drho|~2
    (docs/DESIGN.md §4).  Sensitivities are left untouched (constants of
    the setup point, like the reference's).

    ``warm=True`` (the solve-loop default) starts the fixed point from the
    CURRENT (Kinf, Pinf) — same fixed point and stopping rule, typically a
    handful of iterations per update instead of hundreds; ``warm=False``
    cold-starts from P = rho*I exactly like the setup, making the rebuilt
    terms match ``precompute_cache`` at ``new_rho`` bitwise (both pinned in
    tests/test_rho_rebuild.py)."""
    from . import riccati

    dtype = cache.Kinf.dtype
    new_rho = jnp.asarray(new_rho, dtype)
    # Fold order matters for bitwise parity with precompute_cache: the setup
    # computes ((Q_user + rho) + rho) in two adds (make_problem then
    # _cache_terms), not Q_user + 2*rho.
    Q1d = problem.Q - problem.rho_setup + new_rho + new_rho
    R1d = problem.R - problem.rho_setup + new_rho + new_rho
    A, B = problem.A, problem.B
    K0 = cache.Kinf if warm else None
    P0 = cache.Pinf if warm else None
    Kinf, Pinf = riccati.riccati_fixed_point(A, B, Q1d, R1d, new_rho,
                                             max_iter=max_iter, tol=tol,
                                             K0=K0, P0=P0)
    Quu_inv = jnp.linalg.inv(jnp.diag(R1d) + B.T @ Pinf @ B)
    AmBKt = (A - B @ Kinf).T
    return cache.replace(rho=new_rho, Kinf=Kinf, Pinf=Pinf,
                         Quu_inv=Quu_inv, AmBKt=AmBKt,
                         C1=Quu_inv, C2=AmBKt)


def adapt_rho_rebuild(state: State, cache: Cache, problem: Problem,
                      settings: Settings) -> Cache:
    """One adaptive-rho step with the exact rebuild: the configured
    controller driving rebuild_update instead of taylor_update.  A
    prediction that leaves rho unchanged (deadband / clip saturation) skips
    the fixed point entirely."""
    import jax.lax as lax

    dtype = state.x.dtype
    new_rho = _predicted_rho(state, cache, problem, settings, dtype)
    return lax.cond(new_rho != cache.rho,
                    lambda _: rebuild_update(cache, problem, new_rho),
                    lambda _: cache, None)
