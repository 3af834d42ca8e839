"""Infinite-horizon Riccati cache precomputation and rho sensitivities.

Re-implements, TPU-first, the semantics of:
  * tiny_precompute_and_set_cache  (/root/reference/src/codegen_src/tinympc/tiny_api.cpp:124-190)
  * solve_lqr / compute_sensitivity_autograd  (/root/reference/src/TinyMPC.jl:301-351)

Reference-parity quirk preserved deliberately: `tiny_setup` folds rho into the
diagonal costs once (`work->Q = (Q + rho I).diagonal()`, tiny_api.cpp:90-91) and
then passes the folded costs to `tiny_precompute_and_set_cache`, which adds
`rho * I` AGAIN (tiny_api.cpp:134-135).  The Riccati recursion therefore runs on
`Q + 2*rho*I` while the ADMM linear-cost update uses `Q + rho*I`.  We replicate
this exactly: `precompute_cache` expects the ALREADY-FOLDED diagonals from
`Problem.Q/R` and adds one more rho internally.

Instead of the reference's finite differences (h = 1e-6, TinyMPC.jl:301-321) the
default sensitivity path is exact forward-mode autodiff (`jax.jacfwd`) through
the Riccati fixed point — `lax.while_loop` is forward-mode differentiable, and
the JVP of a contraction iteration converges to the true fixed-point derivative.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..types import Cache


def riccati_fixed_point(A, B, Q1_diag, R1_diag, rho, *, max_iter: int = 1000,
                        tol: float = 1e-5, K0=None, P0=None):
    """Iterate K = (R1 + B'PB)^-1 B'PA;  P = Q1 + A'P(A - BK)  to convergence.

    Mirrors the loop at tiny_api.cpp:146-166 exactly: starts from K=0,
    P = rho*I, computes (Kinf, Pinf) from the previous P, and stops when
    ||Kinf - K_prev||_inf < tol — *without* committing the last (K, P) back to
    the carried previous values on the converged step.

    ``K0``/``P0`` override the start point (the adaptive-rho rebuild warm
    starts from the current cache — same fixed point and stopping rule, a
    handful of iterations instead of hundreds; ops/rho.rebuild_update).

    Returns (Kinf, Pinf).
    """
    dtype = A.dtype
    nx = A.shape[0]
    nu = B.shape[1]
    R1 = jnp.diag(R1_diag)
    Q1 = jnp.diag(Q1_diag)

    def cond(carry):
        _, _, _, _, i, converged = carry
        return jnp.logical_and(i < max_iter, jnp.logical_not(converged))

    def body(carry):
        Ktp1, Ptp1, _, _, i, _ = carry
        BtP = B.T @ Ptp1
        Kinf = jnp.linalg.solve(R1 + BtP @ B, BtP @ A)
        Pinf = Q1 + A.T @ Ptp1 @ (A - B @ Kinf)
        converged = jnp.max(jnp.abs(Kinf - Ktp1)) < jnp.asarray(tol, dtype)
        # Only advance the "previous" iterates when not converged (reference
        # breaks before the Ktp1/Ptp1 assignment, tiny_api.cpp:157-165).
        Ktp1_n = jnp.where(converged, Ktp1, Kinf)
        Ptp1_n = jnp.where(converged, Ptp1, Pinf)
        return (Ktp1_n, Ptp1_n, Kinf, Pinf, i + 1, converged)

    if K0 is None:
        K0 = jnp.zeros((nu, nx), dtype)
    if P0 is None:
        P0 = rho * jnp.eye(nx, dtype=dtype)
    carry = (K0, P0, K0, P0, jnp.zeros((), jnp.int32), jnp.asarray(False))
    _, _, Kinf, Pinf, _, _ = lax.while_loop(cond, body, carry)
    return Kinf, Pinf


def _cache_terms(A, B, Q_work_diag, R_work_diag, rho, *, max_iter=1000, tol=1e-5):
    """(Kinf, Pinf, Quu_inv, AmBKt) from already-rho-folded work diagonals.

    Adds the reference's second rho fold (tiny_api.cpp:134-135) internally.
    """
    dtype = A.dtype
    Q1d = Q_work_diag + rho
    R1d = R_work_diag + rho
    Kinf, Pinf = riccati_fixed_point(A, B, Q1d, R1d, rho, max_iter=max_iter, tol=tol)
    R1 = jnp.diag(R1d)
    Quu_inv = jnp.linalg.inv(R1 + B.T @ Pinf @ B)
    AmBKt = (A - B @ Kinf).T
    return Kinf, Pinf, Quu_inv, AmBKt


def precompute_cache(A, B, Q_work_diag, R_work_diag, rho, *, max_iter: int = 1000,
                     tol: float = 1e-5, compute_sensitivity: bool = True) -> Cache:
    """Build the full solver Cache.

    `Q_work_diag`/`R_work_diag` are the once-folded diagonals stored in
    `Problem.Q`/`Problem.R` (i.e. user cost + rho).  Sensitivities are exact
    d/d rho of (Kinf, Pinf, Quu_inv, AmBKt) at the *same* double-fold
    semantics, replacing the reference's hard-coded quadrotor constants
    (tiny_api.cpp:279-321) and Julia finite differences (TinyMPC.jl:301-321).
    """
    dtype = A.dtype
    rho = jnp.asarray(rho, dtype)
    # Keep the *user* cost fixed while differentiating: the once-folded work
    # diagonals themselves depend on rho (user_cost + rho), so express both
    # folds as functions of rho.
    Q_user = Q_work_diag - rho
    R_user = R_work_diag - rho

    def terms(r):
        # Full f32 matmul precision: the MXU's default bf16 passes are far too
        # coarse for a 1000-iteration fixed point.
        with jax.default_matmul_precision("highest"):
            return _cache_terms(A, B, Q_user + r, R_user + r, r,
                                max_iter=max_iter, tol=tol)

    Kinf, Pinf, Quu_inv, AmBKt = terms(rho)
    if compute_sensitivity:
        dK, dP, dC1, dC2 = jax.jacfwd(terms)(rho)
    else:
        dK = jnp.zeros_like(Kinf)
        dP = jnp.zeros_like(Pinf)
        dC1 = jnp.zeros_like(Quu_inv)
        dC2 = jnp.zeros_like(AmBKt)
    return Cache(
        rho=rho, Kinf=Kinf, Pinf=Pinf, Quu_inv=Quu_inv, AmBKt=AmBKt,
        C1=Quu_inv, C2=AmBKt,
        dKinf_drho=dK, dPinf_drho=dP, dC1_drho=dC1, dC2_drho=dC2,
    )


def solve_lqr(A, B, Q, R, rho, *, max_iter: int = 5000, tol: float = 1e-10,
              reg: float = 1e-8):
    """The Julia-side LQR helper, for API parity with
    `TinyMPC.solve_lqr` (/root/reference/src/TinyMPC.jl:326-351).

    NOTE: this uses a SINGLE rho fold (Q + rho I) — the Julia helper's
    semantics — unlike the C++ cache path's double fold.  Returns
    (K, P, C1, C2) with C1 = inv(R_rho + B'PB), C2 = (A - BK)'.
    """
    A = jnp.asarray(A)
    dtype = A.dtype
    B = jnp.asarray(B, dtype)
    Q = jnp.asarray(Q, dtype)
    R = jnp.asarray(R, dtype)
    if Q.ndim == 1:
        Q = jnp.diag(Q)
    if R.ndim == 1:
        R = jnp.diag(R)
    nx, nu = A.shape[0], B.shape[1]
    Q_rho = Q + rho * jnp.eye(nx, dtype=dtype)
    R_rho = R + rho * jnp.eye(nu, dtype=dtype)
    regI = reg * jnp.eye(nu, dtype=dtype)

    def cond(carry):
        _, _, i, converged = carry
        return jnp.logical_and(i < max_iter, jnp.logical_not(converged))

    def body(carry):
        K_prev, P, i, _ = carry
        K = jnp.linalg.solve(R_rho + B.T @ P @ B + regI, B.T @ P @ A)
        P_new = Q_rho + A.T @ P @ (A - B @ K)
        # Julia: `iter > 1 && norm(K - K_prev) < 1e-10 && break` (Frobenius).
        converged = jnp.logical_and(
            i > 0, jnp.linalg.norm(K - K_prev) < jnp.asarray(tol, dtype))
        return (K, P_new, i + 1, converged)

    K0 = jnp.zeros((nu, nx), dtype)
    carry = (K0, Q_rho, jnp.zeros((), jnp.int32), jnp.asarray(False))
    K, P, _, _ = lax.while_loop(cond, body, carry)
    C1 = jnp.linalg.inv(R_rho + B.T @ P @ B)
    C2 = (A - B @ K).T
    return K, P, C1, C2


def compute_sensitivity_autograd(A, B, Q, R, rho):
    """Exact d/d rho of the Julia-style LQR terms via forward-mode autodiff.

    API analog of `compute_sensitivity_autograd`
    (/root/reference/src/TinyMPC.jl:301-321), which uses finite differences
    with h=1e-6; here the derivative is exact.  Returns (dK, dP, dC1, dC2).
    """
    rho = jnp.asarray(rho, jnp.asarray(A).dtype)

    def terms(r):
        return solve_lqr(A, B, Q, R, r)

    return jax.jacfwd(terms)(rho)


def compute_sensitivity_fd(A, B, Q, R, rho, h: float = 1e-6):
    """Finite-difference sensitivities bit-matching the reference recipe
    (/root/reference/src/TinyMPC.jl:309-318): (f(rho+h) - f(rho)) / h."""
    K0, P0, C10, C20 = solve_lqr(A, B, Q, R, rho)
    K1, P1, C11, C21 = solve_lqr(A, B, Q, R, rho + h)
    return ((K1 - K0) / h, (P1 - P0) / h, (C11 - C10) / h, (C21 - C20) / h)
