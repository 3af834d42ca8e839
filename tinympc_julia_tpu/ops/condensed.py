"""Condensed-iteration formulation: the whole ADMM iteration as two dense
affine maps.

The reference's per-iteration work is two sequential sweeps over the horizon
(forward rollout admm.cpp:25-35, backward recursion admm.cpp:13-20) — a chain
of 2(N-1) dependent (nx,nx)-sized matvecs that leaves the MXU idle between
tiny dependent ops.  But with the Riccati gains frozen (the whole point of
TinyMPC), both sweeps are LINEAR in the iterate, so the horizon recursions can
be *condensed* into block-Toeplitz matrices of closed-loop powers, built once
at setup:

    [u; x]           = T1 @ [d; y; g; x0; 1]        (rollout, all stages)
    d'               = T2 @ [znew; vnew; y'; g'; 1]  (backward, all stages)

and the nonlinear rest of the iteration (slack clip, dual ascent, residuals)
is elementwise.  One ADMM iteration for a batch of B instances becomes two
(≈(nx·N) x (nx·N)) x (dim, B) MXU matmuls + VPU elementwise — no serial
chain, full MXU utilization.  This is the TPU-native answer to the
reference's sweep loop; results match the sequential path up to float
reassociation.

Scope: the full constraint stack (box / per-stage linear / SOC).  The maps
are per-problem; a batch may share one problem (solve_condensed — one shared
matmul) or carry G distinct problems with L lanes each
(solve_condensed_grouped — a vmapped/batched contraction, the
domain-randomized sweep workload).  Fully-unique per-lane problems are the
G=B, L=1 degenerate case; at that extreme the standard path (ops/admm.py via
parallel/batch.py) is usually the better fit since the per-group matmul
degenerates to a matvec.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..types import Cache, Problem, Settings
from . import rho as rho_mod


# method="auto" policy (measured on a v5e chip, see docs/DESIGN.md §3):
# the condensed solve beats BOTH scan paths at every horizon measured
# (N=16..1024, cartpole, B=4096) — there is no solve-rate crossover on TPU.
# The binding constraint is the O((N(nx+nu))^2) map footprint (and its build
# cost), so "auto" uses condensed while the estimated maps fit this budget
# and falls back to the sequential-scan path beyond it.
AUTO_CONDENSED_BUDGET_BYTES = 256 * 2**20


def condensed_footprint_bytes(nx, nu, N, *, itemsize=4,
                              adaptive=False) -> int:
    """Approximate memory of the condensed iteration maps."""
    su = (N - 1) * nu
    sw = su + N * nx
    t1 = sw * (su + nx + 1)
    t2 = su * (2 * sw + 1)
    t12 = sw * (sw + 1)
    if adaptive:  # Taylor stacks: (order+1)=3 T1 blocks, 4 T2 corners
        return (3 * t1 + 4 * t2 + 3 * t12) * itemsize
    return (t1 + t2 + t12) * itemsize


def auto_uses_condensed(nx, nu, N, *, adaptive=False) -> bool:
    """The method="auto" dispatch rule (api.solve_batch, parallel/grouped)."""
    return (condensed_footprint_bytes(nx, nu, N, adaptive=adaptive)
            <= AUTO_CONDENSED_BUDGET_BYTES)


# Beyond the full-condensation budget, "auto" drops to the CHUNKED horizon
# path (ops/scans.build_chunk_maps): one reusable C-stage chunk map +
# lax.scan over N/C chunks — O((C(nx+nu))^2) memory.  Budget bounds the
# chunk map set.
CHUNK_BUDGET_BYTES = 32 * 2**20
CHUNK_TARGET = 128  # preferred chunk size (MXU-friendly row counts)


def chunk_footprint_bytes(nx, nu, C, *, itemsize=4) -> int:
    suc = C * nu
    t1c = (suc + (C + 1) * nx) * (suc + nx + 1)
    return (t1c + C * nx * nx + (C * nx) ** 2) * itemsize


def auto_chunk_size(nx, nu, N):
    """Pick the chunk size for the chunked horizon path: the divisor of
    N-1 nearest CHUNK_TARGET whose maps fit CHUNK_BUDGET_BYTES; None when
    no divisor >= 2 fits (then "auto" falls back to the sequential scan)."""
    best = None
    for C in range(2, N):
        if (N - 1) % C:
            continue
        if chunk_footprint_bytes(nx, nu, C) > CHUNK_BUDGET_BYTES:
            continue
        if best is None or abs(C - CHUNK_TARGET) < abs(best - CHUNK_TARGET):
            best = C
    return best


class CondensedMaps(NamedTuple):
    """Precomputed dense iteration maps (see module docstring).

    Shapes (su = (N-1)*nu, sx = N*nx):
      T1:  (su + sx, su + nx + 1)        [d; x0; 1] -> [u; x]
      T2:  (su, su + sx + su + sx + 1)   [znew; vnew; y'; g'; 1] -> d'
      T12: (su + sx, su + sx + 1)        [znew - y; vnew - g; 1] -> [u; x]
           minus the x0/const rollout contribution — the ITERATION-FUSED map
           T1[:, :su] @ T2r (T2r = reduced-dual T2), precomputed in float64 on
           host so the fused Pallas kernel runs ONE matmul per iteration
           instead of the T1/T2 pair.
    """
    T1: jax.Array
    T2: jax.Array
    T12: jax.Array


def _t1_numpy(A, B, f, K, N):
    """T1 (float64 numpy) as a function of the LQR gain K.

    Rollout:  x_0 = x0;  x_{i+1} = M x_i + f - B d_i;  u_i = -K x_i - d_i
    with M = A - B K (forward_pass, admm.cpp:25-35).

    Accepts optional leading batch axes on every argument (numpy matmul
    broadcasting) — the grouped builders reuse this directly.
    """
    nx, nu = B.shape[-2], B.shape[-1]
    su, sx = (N - 1) * nu, N * nx
    bsh = B.shape[:-2]

    M = A - B @ K  # closed-loop matrix
    fcol = f[..., :, None]  # (..., nx, 1)

    # x_i = M^i x0 + sum_{j<i} M^(i-1-j) (f - B d_j)
    powers = [np.broadcast_to(np.eye(nx), bsh + (nx, nx))]
    for _ in range(N):
        powers.append(M @ powers[-1])

    # x rows: (sx, su) in d, (sx, nx) in x0, (sx, 1) const
    X_d = np.zeros(bsh + (sx, su))
    X_x0 = np.zeros(bsh + (sx, nx))
    X_c = np.zeros(bsh + (sx, 1))
    for i in range(N):
        X_x0[..., i * nx:(i + 1) * nx, :] = powers[i]
        for j in range(i):
            X_d[..., i * nx:(i + 1) * nx, j * nu:(j + 1) * nu] = \
                -(powers[i - 1 - j] @ B)
            X_c[..., i * nx:(i + 1) * nx, :] += powers[i - 1 - j] @ fcol
    # u rows: u_i = -K x_i - d_i (i = 0..N-2)
    U_d = np.zeros(bsh + (su, su))
    U_x0 = np.zeros(bsh + (su, nx))
    U_c = np.zeros(bsh + (su, 1))
    for i in range(N - 1):
        r0, r1 = i * nu, (i + 1) * nu
        U_d[..., r0:r1, :] = -(K @ X_d[..., i * nx:(i + 1) * nx, :])
        U_d[..., r0:r1, r0:r1] -= np.eye(nu)
        U_x0[..., r0:r1, :] = -(K @ X_x0[..., i * nx:(i + 1) * nx, :])
        U_c[..., r0:r1, :] = -(K @ X_c[..., i * nx:(i + 1) * nx, :])

    # input vector layout: [d (su); x0 (nx); 1] — the rollout depends only on
    # d, x0 and the constant term.
    in1 = su + nx + 1
    T1 = np.zeros(bsh + (su + sx, in1))
    T1[..., :su, :su] = U_d
    T1[..., :su, su:su + nx] = U_x0
    T1[..., :su, -1:] = U_c
    T1[..., su:, :su] = X_d
    T1[..., su:, su:su + nx] = X_x0
    T1[..., su:, -1:] = X_c
    return T1


def _t2_numpy(B, Qd, Rd, Xref, Uref, K, Quu, Am, Pinf, rho, N):
    """T2 (float64 numpy), parameterized by the quantities that move under
    adaptive-rho: the explicit rho folding + Pinf (update_linear_cost,
    admm.cpp:75-83) and the gain K (backward_pass_grad, admm.cpp:13-20).
    Quu/Am stay setup-time constants — the reference Taylor-updates C1/C2 but
    keeps using the stale Quu_inv/AmBKt (the dead-write quirk,
    rho_benchmark.cpp:199-212).

      r_i = rref_i - rho (znew_i - y'_i)
      q_i = qref_i - rho (vnew_i - g'_i)
      p_{N-1} = pNref - rho (vnew_{N-1} - g'_{N-1})
      p_i = Am p_{i+1} + (q_i - K^T r_i)
      d'_i = Quu (B^T p_{i+1} + r_i)

    Accepts optional leading batch axes (rho then has shape bsh) — the
    grouped builders reuse this directly.
    """
    nx, nu = B.shape[-2], B.shape[-1]
    su, sx = (N - 1) * nu, N * nx
    bsh = B.shape[:-2]
    rho_s = np.asarray(rho)[..., None, None]  # (..., 1, 1)
    BT = np.swapaxes(B, -1, -2)
    KT = np.swapaxes(K, -1, -2)
    PinfT = np.swapaxes(Pinf, -1, -2)

    rref = (-(Uref * Rd[..., None, :])).reshape(bsh + (su, 1))
    qref = (-(Xref * Qd[..., None, :])).reshape(bsh + (sx, 1))
    pNref = -(PinfT @ Xref[..., -1, :, None])  # (..., nx, 1)

    # Build p_i as affine in [znew; vnew; y'; g'; 1]
    in2 = su + sx + su + sx + 1
    iz, iv, iy, ig = 0, su, su + sx, su + sx + su

    def r_row(i):
        """r_i as (..., nu, in2) affine map."""
        R = np.zeros(bsh + (nu, in2))
        r0 = i * nu
        R[..., :, iz + r0:iz + r0 + nu] = -rho_s * np.eye(nu)
        R[..., :, iy + r0:iy + r0 + nu] = rho_s * np.eye(nu)
        R[..., :, -1:] = rref[..., r0:r0 + nu, :]
        return R

    def q_row(i):
        Q = np.zeros(bsh + (nx, in2))
        r0 = i * nx
        Q[..., :, iv + r0:iv + r0 + nx] = -rho_s * np.eye(nx)
        Q[..., :, ig + r0:ig + r0 + nx] = rho_s * np.eye(nx)
        Q[..., :, -1:] = qref[..., r0:r0 + nx, :]
        return Q

    pN = np.zeros(bsh + (nx, in2))
    r0 = (N - 1) * nx
    pN[..., :, iv + r0:iv + r0 + nx] = -rho_s * np.eye(nx)
    pN[..., :, ig + r0:ig + r0 + nx] = rho_s * np.eye(nx)
    pN[..., :, -1:] = pNref

    T2 = np.zeros(bsh + (su, in2))
    p_next = pN
    for i in range(N - 2, -1, -1):
        ri = r_row(i)
        d_i = Quu @ (BT @ p_next + ri)
        T2[..., i * nu:(i + 1) * nu, :] = d_i
        p_next = q_row(i) + Am @ p_next - KT @ ri
    return T2


def build_condensed(problem: Problem, cache: Cache) -> CondensedMaps:
    """Build T1/T2 in float64 on host, cast to the problem dtype.

    ``problem``/``cache`` may carry a leading group axis (a batched pytree of
    G distinct problems, the per-instance workload): the maps then gain the
    same leading axis and feed the grouped solvers below."""
    N = problem.N
    A = np.asarray(problem.A, np.float64)
    B = np.asarray(problem.B, np.float64)
    f = np.asarray(problem.f, np.float64)
    K = np.asarray(cache.Kinf, np.float64)
    Quu = np.asarray(cache.Quu_inv, np.float64)
    Am = np.asarray(cache.AmBKt, np.float64)
    Pinf = np.asarray(cache.Pinf, np.float64)
    rho = np.asarray(cache.rho, np.float64)
    Qd = np.asarray(problem.Q, np.float64)
    Rd = np.asarray(problem.R, np.float64)
    Xref = np.asarray(problem.Xref, np.float64)
    Uref = np.asarray(problem.Uref, np.float64)

    T1 = _t1_numpy(A, B, f, K, N)
    T2 = _t2_numpy(B, Qd, Rd, Xref, Uref, K, Quu, Am, Pinf, rho, N)

    # Iteration-fused map for the Pallas kernel: substitute the backward map
    # into the next forward map.  su/sx/nu layout as in the class docstring.
    nx, nu = B.shape[-2], B.shape[-1]
    su, sx = (N - 1) * nu, N * nx
    T2r = np.concatenate([T2[..., :, :su + sx], T2[..., :, -1:]], axis=-1)
    T12 = T1[..., :, :su] @ T2r

    dtype = problem.A.dtype
    return CondensedMaps(T1=jnp.asarray(T1, dtype), T2=jnp.asarray(T2, dtype),
                         T12=jnp.asarray(T12, dtype))


def _t1_taylor_numpy(A, B, f, K0, dK, N, order):
    """Taylor coefficients (in drho = rho - rho0) of T1 under the reference's
    linearized cache K(rho) = K0 + drho * dK (rho_benchmark.cpp:199-212).

    T1's entries are polynomials of degree <= N in drho (powers of the
    closed-loop matrix M(rho) = A - B K(rho)); the coefficients up to `order`
    are computed EXACTLY by carrying truncated coefficient lists through the
    power recursion (no finite differencing).  Returns (order+1, su+sx, in1),
    with optional leading batch axes ahead of the order axis
    (..., order+1, su+sx, in1) when the arguments are batched.
    """
    nx, nu = B.shape[-2], B.shape[-1]
    su, sx = (N - 1) * nu, N * nx
    in1 = su + nx + 1
    o = order
    bsh = B.shape[:-2]

    def pmul(Pa, Pb):
        """Truncated product of matrix-coefficient lists."""
        out = []
        for k in range(o + 1):
            acc = Pa[0] @ Pb[k]
            for i in range(1, k + 1):
                acc = acc + Pa[i] @ Pb[k - i]
            out.append(acc)
        return out

    zM = np.zeros(bsh + (nx, nx))
    Mc = [A - B @ K0, -(B @ dK)] + [zM] * (o - 1)
    Kc = [K0, dK] + [np.zeros_like(K0)] * (o - 1)
    fcol = f[..., :, None]

    # pw[i] = coeff list of M(rho)^i ; cs[i] = coeff list of
    # sum_{j<i} M^(i-1-j) f  (the affine-term accumulation)
    pw = [[np.broadcast_to(np.eye(nx), bsh + (nx, nx))] + [zM] * o]
    cs = [[np.zeros(bsh + (nx, 1)) for _ in range(o + 1)]]
    for _ in range(N - 1):
        pw.append(pmul(Mc, pw[-1]))
        nc = pmul(Mc, cs[-1])
        nc[0] = nc[0] + fcol
        cs.append(nc)

    # per-stage x-row blocks as coefficient lists of (..., nx, in1)
    Xrows = []
    for i in range(N):
        row = []
        for k in range(o + 1):
            Rk = np.zeros(bsh + (nx, in1))
            for j in range(i):
                Rk[..., :, j * nu:(j + 1) * nu] = -(pw[i - 1 - j][k] @ B)
            Rk[..., :, su:su + nx] = pw[i][k]
            Rk[..., :, -1:] = cs[i][k]
            row.append(Rk)
        Xrows.append(row)

    T1s = []
    for k in range(o + 1):
        T1k = np.zeros(bsh + (su + sx, in1))
        for i in range(N - 1):
            Uk = -(Kc[0] @ Xrows[i][k])
            for a in range(1, k + 1):
                Uk = Uk - Kc[a] @ Xrows[i][k - a]
            if k == 0:
                Uk[..., :, i * nu:(i + 1) * nu] -= np.eye(nu)
            T1k[..., i * nu:(i + 1) * nu, :] = Uk
        for i in range(N):
            T1k[..., su + i * nx:su + (i + 1) * nx, :] = Xrows[i][k]
        T1s.append(T1k)
    return np.stack(T1s, axis=-3)


class CondensedTaylorMaps(NamedTuple):
    """Taylor-expanded condensed maps for per-lane adaptive-rho.

    T1s: (order+1, su+sx, in1) — Taylor coefficients of T1 in drho.
    T2s: (4, su, in2) — T2 is EXACTLY bilinear in (rho_rq, rho_K): the
         cost-fold rho + Pinf enter r/q/p_N affinely (update_linear_cost runs
         BEFORE a same-iteration rho update, so it sees the pre-update rho)
         while K enters the backward recursion linearly with the POST-update
         rho; Quu/AmBKt stay constant (the reference's dead-write quirk).
         Stored as [T2_00, dT2/drho_rq, dT2/drho_K, cross], identified exactly
         from 4 corner evaluations.
    rho0: expansion center (the setup rho).
    """
    T1s: jax.Array
    T2s: jax.Array
    rho0: jax.Array


def build_condensed_taylor(problem: Problem, cache: Cache,
                           order: int = 2) -> CondensedTaylorMaps:
    """Build the Taylor-expanded condensed maps (float64 on host).

    Like build_condensed, accepts a leading group axis on ``problem``/
    ``cache`` (maps gain the same leading axis; rho0 becomes (G,))."""
    if order < 1:
        raise ValueError("order must be >= 1")
    N = problem.N
    A = np.asarray(problem.A, np.float64)
    B = np.asarray(problem.B, np.float64)
    f = np.asarray(problem.f, np.float64)
    K0 = np.asarray(cache.Kinf, np.float64)
    dK = np.asarray(cache.dKinf_drho, np.float64)
    P0 = np.asarray(cache.Pinf, np.float64)
    dP = np.asarray(cache.dPinf_drho, np.float64)
    Quu = np.asarray(cache.Quu_inv, np.float64)
    Am = np.asarray(cache.AmBKt, np.float64)
    rho0 = np.asarray(cache.rho, np.float64)
    Qd = np.asarray(problem.Q, np.float64)
    Rd = np.asarray(problem.R, np.float64)
    Xref = np.asarray(problem.Xref, np.float64)
    Uref = np.asarray(problem.Uref, np.float64)

    T1s = _t1_taylor_numpy(A, B, f, K0, dK, N, order)

    def t2(drq, drk):
        return _t2_numpy(B, Qd, Rd, Xref, Uref, K0 + drk * dK, Quu, Am,
                         P0 + drq * dP, rho0 + drq, N)

    T00 = t2(0.0, 0.0)
    Ta = t2(1.0, 0.0) - T00
    Tb = t2(0.0, 1.0) - T00
    Tab = t2(1.0, 1.0) - T00 - Ta - Tb
    T2s = np.stack([T00, Ta, Tb, Tab], axis=-3)

    dtype = problem.A.dtype
    return CondensedTaylorMaps(T1s=jnp.asarray(T1s, dtype),
                               T2s=jnp.asarray(T2s, dtype),
                               rho0=jnp.asarray(rho0, dtype))


def _osqp_residuals_stacked(x, u, z, v, y, g, problem: Problem, cache: Cache,
                            drho, N):
    """Per-lane OSQP-form residuals on the stacked (dim, B) layout — the same
    values as ops/rho.osqp_residuals (compute_residuals,
    rho_benchmark.cpp:146-173) for each lane, with the per-lane Taylor
    terminal cost Pinf + drho * dPinf.  Returns four (B,) vectors."""
    nx, nu = problem.nx, problem.nu
    Bsz = x.shape[1]
    x3 = x.reshape(N, nx, Bsz)
    u3 = u.reshape(N - 1, nu, Bsz)
    z3 = z.reshape(N - 1, nu, Bsz)
    v3 = v.reshape(N, nx, Bsz)
    y3 = y.reshape(N - 1, nu, Bsz)
    g3 = g.reshape(N, nx, Bsz)
    A, Bm = problem.A, problem.B
    Qd, Rd = problem.Q, problem.R

    def amax(t):
        return jnp.max(jnp.abs(t), axis=(0, 1))

    dyn = (jnp.einsum("ij,njb->nib", A, x3[:-1])
           + jnp.einsum("ij,njb->nib", Bm, u3) - x3[1:])
    ax_inf = jnp.maximum(amax(u3), amax(dyn))
    z_inf = jnp.maximum(amax(z3), amax(v3[1:]))
    pri_res = jnp.maximum(amax(u3 - z3), amax(dyn - v3[1:]))
    pri_norm = jnp.maximum(ax_inf, z_inf)

    xN = x3[-1]
    PxN = cache.Pinf @ xN + drho[None, :] * (cache.dPinf_drho @ xN)
    Px_states = jnp.concatenate([x3[:-1] * Qd[None, :, None], PxN[None]], 0)
    Px_inputs = u3 * Rd[None, :, None]
    q_states = x3 * Qd[None, :, None]
    q_inputs = u3 * Rd[None, :, None]

    aty_states = jnp.zeros_like(x3)
    aty_states = aty_states.at[:-1].add(jnp.einsum("ji,njb->nib", A, g3[1:]))
    aty_states = aty_states.at[1:].add(-g3[1:])
    aty_inputs = jnp.einsum("ji,njb->nib", Bm, g3[1:]) + y3

    r_ds = Px_states + q_states + aty_states
    r_di = Px_inputs + q_inputs + aty_inputs
    dual_res = jnp.maximum(amax(r_ds), amax(r_di))
    px_inf = jnp.maximum(amax(Px_states), amax(Px_inputs))
    aty_inf = jnp.maximum(amax(aty_states), amax(aty_inputs))
    q_inf = jnp.maximum(amax(q_states), amax(q_inputs))
    dual_norm = jnp.maximum(jnp.maximum(px_inf, aty_inf), q_inf)
    return pri_res, dual_res, pri_norm, dual_norm


def _halfspaces_stacked(w, Alin, blin, n_stages, dim):
    """Cyclic halfspace projections on a stacked (n_stages*dim, B) array:
    per-stage a_j . w_k <= b_j (ops/projections.py semantics on the condensed
    layout)."""
    if Alin.shape[0] == 0:
        return w
    B = w.shape[1]
    w3 = w.reshape(n_stages, dim, B)
    inv_sq = 1.0 / jnp.maximum(jnp.sum(Alin * Alin, axis=-1),
                               jnp.asarray(1e-30, w.dtype))

    def row_step(w_cur, inp):
        a, b, s = inp
        viol = jnp.maximum(jnp.einsum("kdb,d->kb", w_cur, a) - b, 0.0)
        return w_cur - viol[:, None, :] * (a * s)[None, :, None], None

    w3, _ = lax.scan(row_step, w3, (Alin, blin, inv_sq))
    return w3.reshape(n_stages * dim, B)


def _cones_stacked(w, cones, n_stages, dim):
    """Scaled-SOC projections on a stacked (n_stages*dim, B) array (per-stage
    cones, _project_soc_scaled semantics)."""
    if cones.num_cones == 0:
        return w
    B = w.shape[1]
    w3 = w.reshape(n_stages, dim, B)
    for k, (start, cdim) in enumerate(zip(cones.starts, cones.dims)):
        seg = w3[:, start:start + cdim, :]          # (n_stages, cdim, B)
        vpart = seg[:, :-1, :]
        s = seg[:, -1, :]
        mu = cones.mus[k]
        a = jnp.sqrt(jnp.sum(vpart * vpart, axis=1))
        u0 = s * mu
        safe_a = jnp.maximum(a, jnp.asarray(1e-30, w.dtype))
        factor = (a + u0) / (2.0 * safe_a)
        proj_v = factor[:, None, :] * vpart
        proj_s = factor * (a / mu)
        proj = jnp.concatenate([proj_v, proj_s[:, None, :]], axis=1)
        below = (a <= -u0)[:, None, :]
        inside = (a <= u0)[:, None, :]
        out = jnp.where(below, jnp.zeros_like(seg),
                        jnp.where(inside, seg, proj))
        w3 = w3.at[:, start:start + cdim, :].set(out)
    return w3.reshape(n_stages * dim, B)


class CondensedCarry(NamedTuple):
    """Warm-start carry for the condensed solver (stacked (dim, B) layout):
    the iterate subset that survives between solves — the reference's
    persistent workspace (SURVEY.md §5.4)."""
    d: jax.Array  # (su, B)
    y: jax.Array  # (su, B)
    g: jax.Array  # (sx, B)
    v: jax.Array  # (sx, B)
    z: jax.Array  # (su, B)


def _solve_condensed_impl(problem: Problem, cache: Cache, maps: CondensedMaps,
                          settings: Settings, x0s, warm: CondensedCarry = None,
                          d_ref=None):
    """Batched solve via the condensed maps.  x0s: (B, nx); ``warm``
    optionally resumes from a previous solve's carry (warm starting).

    Returns (x (B, N, nx), u (B, N-1, nu), iters (B,), solved (B,), carry) —
    solutions are the slack iterates, reference semantics.

    Note: adaptive-rho is not supported on this path (the maps are built for
    a fixed rho); use the standard path (parallel/batch.py) for adaptive-rho.
    """
    if settings.adaptive_rho:
        raise ValueError(
            "adaptive_rho on the condensed path requires the Taylor-expanded "
            "maps; use solve_condensed_adaptive")
    nx, nu, N = problem.nx, problem.nu, problem.N
    su, sx = (N - 1) * nu, N * nx
    B = x0s.shape[0]
    dtype = x0s.dtype
    rho = jnp.asarray(cache.rho, dtype)

    umin = problem.u_min.reshape(su, 1)
    umax = problem.u_max.reshape(su, 1)
    xmin = problem.x_min.reshape(sx, 1)
    xmax = problem.x_max.reshape(sx, 1)

    pri_tol = jnp.asarray(settings.abs_pri_tol, dtype)
    dua_tol = jnp.asarray(settings.abs_dua_tol, dtype)

    T1, T2 = maps.T1, maps.T2
    # Reduced backward map: the duals enter T2 only through rho (y - znew) /
    # rho (g - vnew) (update_linear_cost, admm.cpp:75-83), so the y/g blocks
    # are exact negations of the z/v blocks — contract on [znew-y; vnew-g; 1].
    T2r = jnp.concatenate([T2[:, :su + sx], T2[:, -1:]], axis=1)
    x0T = x0s.T  # (nx, B)
    ones = jnp.ones((1, B), dtype)

    def mm(Tm, vec):
        return jax.lax.dot_general(
            Tm, vec, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST)

    def body(carry):
        d, y, g, v, z, out_x, out_u, out_it, out_solved, conv, i = carry

        vec1 = jnp.concatenate([d, x0T, ones], axis=0)
        ux = mm(T1, vec1)
        u = ux[:su]
        x = ux[su:]

        alpha = settings.relaxation_alpha
        if alpha != 1.0:
            u_hat = alpha * u + (1.0 - alpha) * z
            x_hat = alpha * x + (1.0 - alpha) * v
        else:
            u_hat, x_hat = u, x
        znew = u_hat + y
        if settings.en_input_bound:
            znew = jnp.clip(znew, umin, umax)
        vnew = x_hat + g
        if settings.en_state_bound:
            vnew = jnp.clip(vnew, xmin, xmax)
        if settings.en_input_linear:
            znew = _halfspaces_stacked(znew, problem.Alin_u, problem.blin_u,
                                       N - 1, nu)
        if settings.en_state_linear:
            vnew = _halfspaces_stacked(vnew, problem.Alin_x, problem.blin_x,
                                       N, nx)
        if settings.en_input_soc:
            znew = _cones_stacked(znew, problem.cones_u, N - 1, nu)
        if settings.en_state_soc:
            vnew = _cones_stacked(vnew, problem.cones_x, N, nx)

        # lanes converged in a PREVIOUS iteration are frozen entirely
        # (reference early-return semantics)
        y = jnp.where(conv[None, :], y, y + u_hat - znew)
        g = jnp.where(conv[None, :], g, g + x_hat - vnew)

        # termination residuals (admm.cpp:93-96)
        ps = jnp.max(jnp.abs(x - vnew), axis=0)
        pi = jnp.max(jnp.abs(u - znew), axis=0)
        ds = jnp.max(jnp.abs(v - vnew), axis=0) * rho
        di = jnp.max(jnp.abs(z - znew), axis=0) * rho
        ok = (ps < pri_tol) & (pi < pri_tol) & (ds < dua_tol) & (di < dua_tol)
        if settings.check_termination > 1:
            ok = jnp.logical_and(ok, ((i + 1) % settings.check_termination) == 0)
        elif settings.check_termination <= 0:
            ok = jnp.zeros_like(ok)
        newly = jnp.logical_and(ok, jnp.logical_not(conv))

        out_x = jnp.where(newly[None, :], vnew, out_x)
        out_u = jnp.where(newly[None, :], znew, out_u)
        out_it = jnp.where(newly, i + 1, out_it)
        out_solved = jnp.where(newly, 1, out_solved)
        conv_all = jnp.logical_or(conv, newly)

        # v/z/d do not advance on (or after) a lane's converging iteration —
        # the reference returns before the slack copy + backward pass
        # (admm.cpp:181-199); required for exact warm-start parity.
        v = jnp.where(conv_all[None, :], v, vnew)
        z = jnp.where(conv_all[None, :], z, znew)

        vec2 = jnp.concatenate([znew - y, vnew - g, ones], axis=0)
        d_new = mm(T2r, vec2)
        if d_ref is not None:
            d_new = d_new + d_ref[:, None]
        d = jnp.where(conv_all[None, :], d, d_new)

        return (d, y, g, v, z, out_x, out_u, out_it, out_solved, conv_all,
                i + 1)

    def cond(carry):
        conv, i = carry[-2], carry[-1]
        return jnp.logical_and(i < settings.max_iter,
                               jnp.logical_not(jnp.all(conv)))

    if warm is None:
        zeros_u = jnp.zeros((su, B), dtype)
        zeros_x = jnp.zeros((sx, B), dtype)
        warm = CondensedCarry(d=zeros_u, y=zeros_u, g=zeros_x,
                              v=zeros_x, z=zeros_u)
    carry0 = (warm.d, warm.y, warm.g, warm.v, warm.z,
              jnp.zeros((sx, B), dtype), jnp.zeros((su, B), dtype),
              jnp.full((B,), settings.max_iter, jnp.int32),
              jnp.zeros((B,), jnp.int32),
              jnp.zeros((B,), bool), jnp.zeros((), jnp.int32))
    (d, y, g, v, z, out_x, out_u, out_it, out_solved, conv, _) = \
        lax.while_loop(cond, body, carry0)

    # unconverged lanes: last slack iterates (v/z hold vnew/znew after body)
    out_x = jnp.where(conv[None, :], out_x, v)
    out_u = jnp.where(conv[None, :], out_u, z)

    xs = out_x.T.reshape(B, N, nx)
    us = out_u.T.reshape(B, N - 1, nu)
    return xs, us, out_it, out_solved, CondensedCarry(d=d, y=y, g=g, v=v, z=z)


def ref_backward_const(problem: Problem, cache: Cache, Xref=None, Uref=None):
    """The reference trajectories' contribution to the condensed backward map:
    d_ref (su,) = backward pass of (qref, rref, pNref) alone.

    Refs enter the condensed iteration ONLY through this constant (they
    appear in q/r/p_N linearly, admm.cpp:75-83), so per-step moving
    references (the rocket pattern) need just this small jax recomputation —
    not a rebuild of the T1/T2 maps.  Build maps with zero refs and add this
    vector to the T2 product.
    """
    Xref = problem.Xref if Xref is None else Xref
    Uref = problem.Uref if Uref is None else Uref
    rref = -(Uref * problem.R)                     # (N-1, nu)
    qref = -(Xref * problem.Q)                     # (N, nx)
    pN = -(cache.Pinf.T @ Xref[-1])                # (nx,)

    B = problem.B
    Quu, Am, KT = cache.Quu_inv, cache.AmBKt, cache.Kinf.T

    def step(p_next, inp):
        q_i, r_i = inp
        d_i = Quu @ (B.T @ p_next + r_i)
        p_i = q_i + Am @ p_next - KT @ r_i
        return p_i, d_i

    _, d = lax.scan(step, pN, (qref[:-1], rref), reverse=True)
    return d.reshape(-1)                           # (su,)


@jax.jit
def _solve_condensed(problem, cache, maps, x0s, warm, settings):
    return _solve_condensed_impl(problem, cache, maps, settings, x0s, warm)


def solve_condensed(problem: Problem, cache: Cache, settings: Settings, x0s,
                    maps: CondensedMaps | None = None, *,
                    warm: CondensedCarry | None = None,
                    return_carry: bool = False):
    """Convenience wrapper: build maps if needed and run the condensed solve.

    Returns (xs, us, iters, solved), plus the warm-start carry when
    ``return_carry=True`` (pass it back as ``warm=`` for the next solve)."""
    if maps is None:
        maps = build_condensed(problem, cache)
    out = _solve_condensed(problem, cache, maps, x0s, warm, settings)
    return out if return_carry else out[:4]


@jax.jit
def _solve_condensed_grouped(problems, caches, maps, x0s, warm, settings):
    def one(p, c, m, x0, w):
        return _solve_condensed_impl(p, c, m, settings, x0, w)
    return jax.vmap(one)(problems, caches, maps, x0s, warm)


def solve_condensed_grouped(problems: Problem, caches: Cache,
                            settings: Settings, x0s,
                            maps: CondensedMaps | None = None, *,
                            warm: CondensedCarry | None = None,
                            return_carry: bool = False):
    """Per-instance (domain-randomized) problems on the condensed fast path.

    ``problems``/``caches`` are pytrees with a leading group axis G — G
    *distinct* plants/costs/bounds/refs — and ``x0s`` has shape (G, L, nx):
    L initial states per group.  This is the batched analog of the reference's
    per-problem ``tiny_setup`` (/root/reference/src/codegen_src/tinympc/tiny_api.cpp:21-122)
    at sweep scale: the G condensed maps apply as one batched MXU contraction
    (vmap of the shared-problem solver), per-lane semantics identical to
    solving each group alone.

    Returns (xs (G, L, N, nx), us (G, L, N-1, nu), iters (G, L),
    solved (G, L)), plus the (G,)-batched carry when ``return_carry=True``.
    """
    if maps is None:
        maps = build_condensed(problems, caches)
    if warm is None:
        G, L = x0s.shape[0], x0s.shape[1]
        nx, nu = problems.A.shape[-1], problems.B.shape[-1]
        N = problems.Xref.shape[-2]
        su, sx = (N - 1) * nu, N * nx
        zu = jnp.zeros((G, su, L), x0s.dtype)
        zx = jnp.zeros((G, sx, L), x0s.dtype)
        warm = CondensedCarry(d=zu, y=zu, g=zx, v=zx, z=zu)
    out = _solve_condensed_grouped(problems, caches, maps, x0s, warm,
                                   settings)
    return out if return_carry else out[:4]


class AdaptiveCondensedCarry(NamedTuple):
    """Warm-start carry for the adaptive-rho condensed solver: the fixed-rho
    carry plus the per-lane rho each lane ended on."""
    d: jax.Array    # (su, B)
    y: jax.Array    # (su, B)
    g: jax.Array    # (sx, B)
    v: jax.Array    # (sx, B)
    z: jax.Array    # (su, B)
    rho: jax.Array  # (B,)


def _solve_condensed_adaptive_impl(problem: Problem, cache: Cache,
                                   maps: CondensedTaylorMaps,
                                   settings: Settings, x0s,
                                   warm: AdaptiveCondensedCarry = None):
    """Batched condensed solve with PER-LANE adaptive rho.

    The reference's Taylor cache updates (rho_benchmark.cpp:199-212) become
    Taylor-expanded iteration maps applied as shared stacked matmuls combined
    with per-lane drho powers: ux = sum_k drho^k (T1_k @ vec1) and the exact
    bilinear d' = (T2_00 + drq T2_rq + drK T2_K + drq drK T2_x) @ vec2.  The
    rho prediction itself (OSQP residuals -> predict_rho, every 5th iteration
    gated i > 0, admm.cpp:156) is exact per lane.  T2 is exact; T1 is
    truncated at `order` (error O(drho^(order+1)) relative to the standard
    path's Taylor-updated cache — the only approximation on this path).
    """
    nx, nu, N = problem.nx, problem.nu, problem.N
    su, sx = (N - 1) * nu, N * nx
    B = x0s.shape[0]
    dtype = x0s.dtype
    order = maps.T1s.shape[0] - 1
    T1stk = maps.T1s.reshape((order + 1) * (su + sx), -1)
    # reduced backward blocks (y/g columns are exact negations of z/v — see
    # _solve_condensed_impl; holds for every Taylor coefficient block)
    T2r = jnp.concatenate([maps.T2s[:, :, :su + sx], maps.T2s[:, :, -1:]],
                          axis=2)
    T2stk = T2r.reshape(4 * su, -1)
    rho0 = maps.rho0.astype(dtype)

    umin = problem.u_min.reshape(su, 1)
    umax = problem.u_max.reshape(su, 1)
    xmin = problem.x_min.reshape(sx, 1)
    xmax = problem.x_max.reshape(sx, 1)
    pri_tol = jnp.asarray(settings.abs_pri_tol, dtype)
    dua_tol = jnp.asarray(settings.abs_dua_tol, dtype)

    x0T = x0s.T
    ones = jnp.ones((1, B), dtype)

    def mm(Tm, vec):
        return jax.lax.dot_general(
            Tm, vec, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST)

    def body(carry):
        (d, y, g, v, z, rho_b, out_x, out_u, out_it, out_solved, conv,
         i) = carry
        drho = rho_b - rho0                                   # (B,)

        vec1 = jnp.concatenate([d, x0T, ones], axis=0)
        R1 = mm(T1stk, vec1).reshape(order + 1, su + sx, B)
        ux = R1[order]
        for k in range(order - 1, -1, -1):                    # Horner in drho
            ux = ux * drho[None, :] + R1[k]
        u = ux[:su]
        x = ux[su:]

        alpha = settings.relaxation_alpha
        if alpha != 1.0:
            u_hat = alpha * u + (1.0 - alpha) * z
            x_hat = alpha * x + (1.0 - alpha) * v
        else:
            u_hat, x_hat = u, x
        znew = u_hat + y
        if settings.en_input_bound:
            znew = jnp.clip(znew, umin, umax)
        vnew = x_hat + g
        if settings.en_state_bound:
            vnew = jnp.clip(vnew, xmin, xmax)
        if settings.en_input_linear:
            znew = _halfspaces_stacked(znew, problem.Alin_u, problem.blin_u,
                                       N - 1, nu)
        if settings.en_state_linear:
            vnew = _halfspaces_stacked(vnew, problem.Alin_x, problem.blin_x,
                                       N, nx)
        if settings.en_input_soc:
            znew = _cones_stacked(znew, problem.cones_u, N - 1, nu)
        if settings.en_state_soc:
            vnew = _cones_stacked(vnew, problem.cones_x, N, nx)

        y = jnp.where(conv[None, :], y, y + u_hat - znew)
        g = jnp.where(conv[None, :], g, g + x_hat - vnew)

        # rho adaptation every 5th iteration (gate i > 0 and i % 5 == 0,
        # admm.cpp:156); converged lanes keep their rho.
        do_up = jnp.logical_and(i > 0, i % 5 == 0)

        def rho_update(_):
            if settings.adaptive_rho_controller == "termination":
                # per-lane termination residuals at the update point (v/z
                # are the previous slacks — the standard path's
                # predict_rho_termination values), trust-clipped around the
                # Taylor center rho0.
                pri = jnp.maximum(jnp.max(jnp.abs(x - vnew), axis=0),
                                  jnp.max(jnp.abs(u - znew), axis=0))
                dua = rho_b * jnp.maximum(
                    jnp.max(jnp.abs(v - vnew), axis=0),
                    jnp.max(jnp.abs(z - znew), axis=0))
                newr = rho_mod.termination_controller(
                    pri, dua, rho_b, settings, dtype, rho_center=rho0)
            else:
                pri_r, dua_r, pri_n, dua_n = _osqp_residuals_stacked(
                    x, u, znew, vnew, y, g, problem, cache, drho, N)
                newr = rho_mod.predict_rho(pri_r, dua_r, pri_n, dua_n,
                                           rho_b, settings, dtype)
            return jnp.where(conv, rho_b, newr)

        rho_new = lax.cond(do_up, rho_update, lambda _: rho_b, None)
        drho_new = rho_new - rho0

        # termination residuals: the standard body updates the cache BEFORE
        # the check, so duals scale by the NEW rho
        ps = jnp.max(jnp.abs(x - vnew), axis=0)
        pi = jnp.max(jnp.abs(u - znew), axis=0)
        ds = jnp.max(jnp.abs(v - vnew), axis=0) * rho_new
        di = jnp.max(jnp.abs(z - znew), axis=0) * rho_new
        ok = (ps < pri_tol) & (pi < pri_tol) & (ds < dua_tol) & (di < dua_tol)
        if settings.check_termination > 1:
            ok = jnp.logical_and(ok,
                                 ((i + 1) % settings.check_termination) == 0)
        elif settings.check_termination <= 0:
            ok = jnp.zeros_like(ok)
        newly = jnp.logical_and(ok, jnp.logical_not(conv))

        out_x = jnp.where(newly[None, :], vnew, out_x)
        out_u = jnp.where(newly[None, :], znew, out_u)
        out_it = jnp.where(newly, i + 1, out_it)
        out_solved = jnp.where(newly, 1, out_solved)
        conv_all = jnp.logical_or(conv, newly)

        v = jnp.where(conv_all[None, :], v, vnew)
        z = jnp.where(conv_all[None, :], z, znew)

        # backward map: r/q/p_N were folded with the PRE-update rho (drho);
        # the gain K carries the POST-update rho (drho_new)
        vec2 = jnp.concatenate([znew - y, vnew - g, ones], axis=0)
        R2 = mm(T2stk, vec2).reshape(4, su, B)
        d_new = (R2[0] + drho[None, :] * R2[1] + drho_new[None, :] * R2[2]
                 + (drho * drho_new)[None, :] * R2[3])
        d = jnp.where(conv_all[None, :], d, d_new)

        return (d, y, g, v, z, rho_new, out_x, out_u, out_it, out_solved,
                conv_all, i + 1)

    def cond(carry):
        conv, i = carry[-2], carry[-1]
        return jnp.logical_and(i < settings.max_iter,
                               jnp.logical_not(jnp.all(conv)))

    if warm is None:
        zeros_u = jnp.zeros((su, B), dtype)
        zeros_x = jnp.zeros((sx, B), dtype)
        warm = AdaptiveCondensedCarry(
            d=zeros_u, y=zeros_u, g=zeros_x, v=zeros_x, z=zeros_u,
            rho=jnp.full((B,), jnp.asarray(cache.rho, dtype)))
    carry0 = (warm.d, warm.y, warm.g, warm.v, warm.z, warm.rho,
              jnp.zeros((sx, B), dtype), jnp.zeros((su, B), dtype),
              jnp.full((B,), settings.max_iter, jnp.int32),
              jnp.zeros((B,), jnp.int32),
              jnp.zeros((B,), bool), jnp.zeros((), jnp.int32))
    (d, y, g, v, z, rho_b, out_x, out_u, out_it, out_solved, conv, _) = \
        lax.while_loop(cond, body, carry0)

    out_x = jnp.where(conv[None, :], out_x, v)
    out_u = jnp.where(conv[None, :], out_u, z)

    xs = out_x.T.reshape(B, N, nx)
    us = out_u.T.reshape(B, N - 1, nu)
    carry = AdaptiveCondensedCarry(d=d, y=y, g=g, v=v, z=z, rho=rho_b)
    return xs, us, out_it, out_solved, carry


@jax.jit
def _solve_condensed_adaptive(problem, cache, maps, x0s, warm, settings):
    return _solve_condensed_adaptive_impl(problem, cache, maps, settings,
                                          x0s, warm)


def solve_condensed_adaptive(problem: Problem, cache: Cache,
                             settings: Settings, x0s,
                             maps: CondensedTaylorMaps | None = None, *,
                             order: int = 2,
                             warm: AdaptiveCondensedCarry | None = None,
                             return_carry: bool = False):
    """Condensed batched solve with per-lane adaptive rho (see
    _solve_condensed_adaptive_impl).  Returns (xs, us, iters, solved), plus
    the carry (with per-lane final rho) when ``return_carry=True``."""
    if maps is None:
        maps = build_condensed_taylor(problem, cache, order=order)
    out = _solve_condensed_adaptive(problem, cache, maps, x0s, warm, settings)
    return out if return_carry else out[:4]


@jax.jit
def _solve_condensed_adaptive_grouped(problems, caches, maps, x0s, warm,
                                      settings):
    def one(p, c, m, x0, w):
        return _solve_condensed_adaptive_impl(p, c, m, settings, x0, w)
    return jax.vmap(one)(problems, caches, maps, x0s, warm)


def solve_condensed_adaptive_grouped(problems: Problem, caches: Cache,
                                     settings: Settings, x0s,
                                     maps: CondensedTaylorMaps | None = None,
                                     *, order: int = 2,
                                     warm: AdaptiveCondensedCarry | None = None,
                                     return_carry: bool = False):
    """Per-instance problems + per-lane adaptive rho on the condensed path:
    the grouped analog of solve_condensed_adaptive (see
    solve_condensed_grouped for the layout: leading group axis G on
    ``problems``/``caches``; x0s is (G, L, nx))."""
    if maps is None:
        maps = build_condensed_taylor(problems, caches, order=order)
    if warm is None:
        G, L = x0s.shape[0], x0s.shape[1]
        nx, nu = problems.A.shape[-1], problems.B.shape[-1]
        N = problems.Xref.shape[-2]
        su, sx = (N - 1) * nu, N * nx
        zu = jnp.zeros((G, su, L), x0s.dtype)
        zx = jnp.zeros((G, sx, L), x0s.dtype)
        rho0 = jnp.broadcast_to(
            jnp.asarray(caches.rho, x0s.dtype)[:, None], (G, L))
        warm = AdaptiveCondensedCarry(d=zu, y=zu, g=zx, v=zx, z=zu, rho=rho0)
    out = _solve_condensed_adaptive_grouped(problems, caches, maps, x0s,
                                            warm, settings)
    return out if return_carry else out[:4]
