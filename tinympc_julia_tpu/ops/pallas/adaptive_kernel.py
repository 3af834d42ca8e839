"""Pallas fused condensed solver with PER-LANE adaptive rho.

The XLA implementation (ops/condensed.solve_condensed_adaptive) expresses the
reference's Taylor cache updates (rho_benchmark.cpp:199-212) as Taylor-expanded
iteration maps; this kernel keeps that whole iteration VMEM-resident:

* forward map: one stacked matmul over the (order+1) T1 Taylor blocks,
  combined per lane by Horner in drho = rho_lane - rho0;
* backward map: one stacked matmul over the 4 exactly-bilinear T2 blocks
  (reduced [znew - y; vnew - g; 1] contraction), combined with the pre-update
  drho (cost fold) and post-update drho (gain K);
* rho prediction: every 5th iteration (reference gate i > 0 and i % 5 == 0,
  admm.cpp:156) the OSQP-form residuals (rho_benchmark.cpp:146-197) are
  evaluated per lane — the per-stage dynamics and A^T y terms are
  contractions with host-built block matrices (Dx, Du, Gx, Gu), the cost
  terms are stacked-diagonal scalings, and the terminal Pinf(rho) row uses
  the Taylor pair (P0, dP).

Scope: the full constraint stack (box / per-stage halfspace / scaled SOC,
as selector matmuls shared with condensed_kernel.py), float32.
``num_groups=G > 1`` adds a group grid dimension exactly like
condensed_kernel.py: G distinct problems (per-group Taylor maps, residual
maps, bounds, rho0, cone/halfspace data) with L lanes each — the
domain-randomized sweep with per-lane adaptive rho runs fully fused.
``controller="termination"`` swaps the reference's OSQP-form rho
predictor for the extension controller (ops/rho.termination_controller)
computed from the in-vreg termination residuals — the OSQP residual maps
are then never built or loaded.  Semantics match solve_condensed_adaptive (grouped:
solve_condensed_adaptive_grouped) per lane, including
`check_termination=k`
(residual/latch block only every k-th iteration) and the warm-start carry
(AdaptiveFusedCarry mirrors ops/condensed.AdaptiveCondensedCarry: a
continuation restarts the iteration counter, so the i>0 rho-update gate
applies to the continuation's first iteration too — exactly the XLA path's
warm semantics).  ``warm_start``/``carry_out`` enable the two-phase
straggler pipeline for adaptive workloads (bulk pass, compact unconverged
lanes, continue them warm).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..condensed import CondensedTaylorMaps
from ..rho import EPS, TERM_DEADBAND, TERM_MAX_STEP
from .condensed_kernel import (_make_dot, apply_lin, apply_soc,
                               build_constraint_mats, constraint_args_specs)

RHO_INTERVAL = 5  # admm.cpp:156


class AdaptiveFusedCarry(NamedTuple):
    """Warm-start carry of the adaptive fused kernel, stacked (dim, B)
    layout — the kernel-side mirror of ops/condensed.AdaptiveCondensedCarry
    (d/y/g/v/z plus the per-lane rho each lane ended on)."""
    d: jax.Array    # (su, B)
    y: jax.Array    # (su, B)
    g: jax.Array    # (sx, B)
    v: jax.Array    # (sx, B)
    z: jax.Array    # (su, B)
    rho: jax.Array  # (1, B)


def _residual_maps(A, B, N):
    """Host-side block matrices for the stacked OSQP residuals:
    dyn = Dx @ x + Du @ u   ((N-1)*nx rows: A x_i + B u_i - x_{i+1});
    aty_states = Gx @ g     (sx rows: A^T g_{j+1} [j<N-1] - g_j [j>=1]);
    aty_inputs = Gu @ g     (su rows: B^T g_{j+1})."""
    nx, nu = B.shape
    su, sx = (N - 1) * nu, N * nx
    Dx = np.zeros(((N - 1) * nx, sx), np.float32)
    Du = np.zeros(((N - 1) * nx, su), np.float32)
    Gx = np.zeros((sx, sx), np.float32)
    Gu = np.zeros((su, sx), np.float32)
    for i in range(N - 1):
        r = slice(i * nx, (i + 1) * nx)
        Dx[r, i * nx:(i + 1) * nx] = A
        Dx[r, (i + 1) * nx:(i + 2) * nx] = -np.eye(nx)
        Du[r, i * nu:(i + 1) * nu] = B
        # states: x_j gets A^T g_{j+1} (j <= N-2) and -g_j (j >= 1)
        Gx[r, (i + 1) * nx:(i + 2) * nx] = A.T
        Gx[(i + 1) * nx:(i + 2) * nx, (i + 1) * nx:(i + 2) * nx] -= np.eye(nx)
        Gu[i * nu:(i + 1) * nu, (i + 1) * nx:(i + 2) * nx] = B.T
    return Dx, Du, Gx, Gu


def _as_grouped(a, G, nd, name):
    """Normalize host problem data of per-group rank ``nd`` to a leading
    (G, ...) group axis (shared data broadcasts)."""
    a = np.asarray(a, np.float32)
    if a.ndim == nd:
        a = a[None]
    if a.ndim != nd + 1 or a.shape[0] not in (1, G):
        raise ValueError(f"{name}: expected ({G}, ...) or shared data of "
                         f"rank {nd}, got shape {a.shape}")
    return np.broadcast_to(a, (G,) + a.shape[1:])


def make_condensed_adaptive_fused_solver(
        A, B, Qdiag, Rdiag, Pinf, dPinf, N, *,
        batch_tile: int = 2048, max_iter: int = 100,
        abs_pri_tol: float = 1e-3, abs_dua_tol: float = 1e-3,
        en_state_bound: bool = False, en_input_bound: bool = True,
        relaxation_alpha: float = 1.0,
        adaptive_rho_min: float = 1.0, adaptive_rho_max: float = 100.0,
        adaptive_rho_clipping: bool = True,
        check_termination: int = 1,
        controller: str = "osqp", taylor_trust: float = float("inf"),
        soc_u: tuple = (), soc_x: tuple = (), lin_u=None, lin_x=None,
        warm_start: bool = False, carry_out: bool = False,
        precision=jax.lax.Precision.HIGHEST,
        num_groups: int = 1,
        interpret: bool = False):
    """Build the jitted adaptive-rho fused solver.

    A, B, Qdiag, Rdiag (rho-folded diagonals), Pinf, dPinf: host numpy
    problem/cache data (shared across the batch).  Returns
    solve_fn(tmaps: CondensedTaylorMaps, u_min, u_max, x_min, x_max, x0s
    [, warm]) ->
    (x (B,N,nx), u (B,N-1,nu), iters (B,), solved (B,), rho (B,)[, carry]).

    ``controller`` selects the per-lane rho predictor (Settings
    .adaptive_rho_controller semantics): "osqp" is the reference's
    OSQP-form residual controller (rho_benchmark.cpp:146-197, the default);
    "termination" is the extension controller (ops/rho
    .termination_controller) driven by the termination residuals the kernel
    already computes in-vregs — no stacked residual maps are built or
    loaded at all on that config.  ``taylor_trust`` additionally clips the
    termination prediction to rho0 +- trust (per group), protecting the
    first-order Taylor maps from predictions outside their measured
    validity radius (|drho| ~ 2, docs/DESIGN.md §4).

    ``soc_u``/``soc_x``/``lin_u``/``lin_x`` take the same per-stage
    scaled-SOC / halfspace constraint specs as make_condensed_fused_solver
    (selector-matmul projections; per-group mu/b data rides the group
    grid), composing box -> linear -> SOC exactly like the XLA adaptive
    path (ops/condensed.solve_condensed_adaptive).

    ``check_termination=k`` evaluates the residual/latch block only every
    k-th iteration (Settings semantics); max_iter must be a multiple of
    lcm(k, 5) so rho-update and check slots tile the unrolled loop body
    statically.  With ``warm_start=True`` the extra ``warm`` argument is an
    AdaptiveFusedCarry from a previous solve's ``carry_out=True`` result;
    continuation semantics equal solve_condensed_adaptive's (the iteration
    counter restarts, so the first local iteration never updates rho —
    reference gate i > 0, admm.cpp:156).

    VMEM note: the stacked Taylor intermediates scale as
    (order+2)*(su+sx)*batch_tile floats of scoped VMEM; for larger models
    (nx ~ 12, N ~ 20) use batch_tile <= 512 to stay under the ~16 MiB
    scoped-vmem stack limit (cartpole-sized problems run at 2048).
    """
    G = num_groups
    A = _as_grouped(A, G, 2, "A")
    B = _as_grouped(B, G, 2, "B")
    nx, nu = B.shape[-2:]
    Bt = batch_tile
    su, sx = (N - 1) * nu, N * nx
    in1 = su + nx + 1
    in2r = su + sx + 1
    alpha = relaxation_alpha
    ct = check_termination
    if ct < 1:
        raise ValueError("check_termination must be >= 1 on the fused "
                         f"adaptive kernel (got {ct})")
    if controller not in ("osqp", "termination"):
        raise ValueError("controller must be 'osqp' or 'termination', got "
                         f"{controller!r}")
    osqp_ctrl = controller == "osqp"
    # No state-side constraint => the state dual g is identically zero
    # (bit-exact induction from g0 = 0, see condensed_kernel.py): drop the
    # g scratch and its sx-row updates, and the whole A^T g residual block
    # (the Gx/Gu contractions — two of the five matmuls in the OSQP
    # rho-prediction path).
    state_free = ((not en_state_bound) and not soc_x and lin_x is None)
    STEP = math.lcm(RHO_INTERVAL, ct)
    if max_iter % STEP != 0:
        raise ValueError(
            f"max_iter must be a multiple of lcm(check_termination, "
            f"{RHO_INTERVAL}) = {STEP} (got {max_iter}) — the rho-update "
            "and check slots must tile the unrolled loop body")
    if osqp_ctrl:
        # the OSQP-form controller needs the stacked residual maps; the
        # termination controller works entirely from in-vreg iterates
        rmaps = [_residual_maps(A[g], B[g], N) for g in range(G)]
        Dx_m, Du_m, Gx_m, Gu_m = (np.stack([m[k] for m in rmaps])
                                  for k in range(4))
        qd_m = _as_grouped(Qdiag, G, 1, "Qdiag")
        rd_m = _as_grouped(Rdiag, G, 1, "Rdiag")
        qstk = np.tile(qd_m, (1, N)).reshape(G, sx, 1)
        rstk = np.tile(rd_m, (1, N - 1)).reshape(G, su, 1)
        P0_m = _as_grouped(Pinf, G, 2, "Pinf")
        dP_m = _as_grouped(dPinf, G, 2, "dPinf")
    soc_u_mats, soc_x_mats, lin_u_mats, lin_x_mats, n_cref = \
        build_constraint_mats(G, soc_u, soc_x, lin_u, lin_x, N, nx, nu)
    _dot = _make_dot(precision)

    def kernel(*refs):
        it = iter(refs)
        (T1s_r, T2s_r, rho0_r, umin_r, umax_r, xmin_r, xmax_r) = (
            next(it) for _ in range(7))
        if osqp_ctrl:
            Dx_r, Du_r = (next(it) for _ in range(2))
            if not state_free:
                Gx_r, Gu_r = (next(it) for _ in range(2))
            qd_r, rd_r, P0_r, dP_r = (next(it) for _ in range(4))
        soc_u_refs = [[next(it) for _ in range(6)] for _ in soc_u_mats]
        soc_x_refs = [[next(it) for _ in range(6)] for _ in soc_x_mats]
        lin_u_refs = [[next(it) for _ in range(3)] for _ in lin_u_mats]
        lin_x_refs = [[next(it) for _ in range(3)] for _ in lin_x_mats]
        x0_r = next(it)
        if warm_start:
            if state_free:
                d0_r, y0_r, v0_r, z0_r, rhoc_r = (
                    next(it) for _ in range(5))
            else:
                d0_r, y0_r, g0_r, v0_r, z0_r, rhoc_r = (
                    next(it) for _ in range(6))
        xout_r, uout_r, iters_r, solved_r, rho_r = (
            next(it) for _ in range(5))
        if carry_out:
            if state_free:
                dco_r, yco_r, vco_r, zco_r = (next(it) for _ in range(4))
            else:
                dco_r, yco_r, gco_r, vco_r, zco_r = (
                    next(it) for _ in range(5))
        if state_free:
            y_s, vec1_s, vec2_s, rho_s, conv_s = (
                next(it) for _ in range(5))
            g_s = None
        else:
            y_s, g_s, vec1_s, vec2_s, rho_s, conv_s = (
                next(it) for _ in range(6))

        # group-indexed inputs arrive as (1, rows, cols) blocks
        T1s = T1s_r[0]            # ((o+1)(su+sx), in1)
        T2s = T2s_r[0]            # (4 su, in2r)
        order = T1s.shape[0] // (su + sx) - 1
        rho0 = rho0_r[0, 0, 0]
        umin, umax = umin_r[0], umax_r[0]
        xmin, xmax = xmin_r[0], xmax_r[0]
        if osqp_ctrl:
            Dx, Du = Dx_r[0], Du_r[0]
            qd, rd = qd_r[0], rd_r[0]
            P0, dP = P0_r[0], dP_r[0]

        vec1_s[...] = jnp.zeros_like(vec1_s)
        vec1_s[su:su + nx] = x0_r[...]
        vec1_s[in1 - 1:in1, :] = jnp.ones_like(vec1_s[in1 - 1:in1, :])
        vec2_s[...] = jnp.zeros_like(vec2_s)
        vec2_s[in2r - 1:in2r, :] = jnp.ones_like(vec2_s[in2r - 1:in2r, :])
        if warm_start:
            vec1_s[:su] = d0_r[...]
            y_s[...] = y0_r[...]
            if not state_free:
                g_s[...] = g0_r[...]
            xout_r[...] = v0_r[...]
            uout_r[...] = z0_r[...]
            rho_s[...] = rhoc_r[...]
        else:
            y_s[...] = jnp.zeros_like(y_s)
            if not state_free:
                g_s[...] = jnp.zeros_like(g_s)
            xout_r[...] = jnp.zeros_like(xout_r)
            uout_r[...] = jnp.zeros_like(uout_r)
            rho_s[...] = jnp.full_like(rho_s, rho0)
        if carry_out:
            # the v/z CARRY freezes at the pre-convergence iterate (the XLA
            # path's AdaptiveCondensedCarry conv_all mask), while the v/z
            # OUTPUT latches the converging vnew/znew — separate buffers
            vco_r[...] = xout_r[...]
            zco_r[...] = uout_r[...]
        conv_s[...] = jnp.zeros_like(conv_s)
        iters_r[...] = jnp.full_like(iters_r, max_iter)
        solved_r[...] = jnp.zeros_like(solved_r)

        pri_tol = jnp.float32(abs_pri_tol)
        dua_tol = jnp.float32(abs_dua_tol)
        eps = jnp.float32(EPS)

        def predict(x, u, znew, vnew, y, drho, rho_b):
            """Per-lane OSQP residuals -> predicted rho
            (ops/condensed._osqp_residuals_stacked + ops/rho.predict_rho).
            With state_free, g == 0 exactly: the A^T g terms vanish
            (aty_states = 0, aty_inputs = y) and the Gx/Gu contractions are
            skipped entirely."""
            def amax(t):
                return jnp.max(jnp.abs(t), axis=0)[None, :]  # (1, Bt)

            dyn = _dot(Dx, x) + _dot(Du, u)
            v_tail = vnew[nx:]
            pri_res = jnp.maximum(amax(u - znew), amax(dyn - v_tail))
            pri_norm = jnp.maximum(jnp.maximum(amax(u), amax(dyn)),
                                   jnp.maximum(amax(znew), amax(v_tail)))

            xN = x[sx - nx:]
            PxN = _dot(P0, xN) + drho * _dot(dP, xN)
            px_head = x[:sx - nx] * qd[:sx - nx]
            q_states = x * qd
            q_inputs = u * rd
            if state_free:
                aty_u = y
                r_ds_head = px_head + q_states[:sx - nx]
                r_ds_term = PxN + q_states[sx - nx:]
                aty_inf = amax(y)
            else:
                aty_s = _dot(Gx_r[0], g_s[...])
                aty_u = _dot(Gu_r[0], g_s[...]) + y
                r_ds_head = px_head + q_states[:sx - nx] + aty_s[:sx - nx]
                r_ds_term = PxN + q_states[sx - nx:] + aty_s[sx - nx:]
                aty_inf = jnp.maximum(amax(aty_s), amax(aty_u))
            r_di = q_inputs + u * rd + aty_u
            dual_res = jnp.maximum(jnp.maximum(amax(r_ds_head),
                                               amax(r_ds_term)), amax(r_di))
            px_inf = jnp.maximum(jnp.maximum(amax(px_head), amax(PxN)),
                                 amax(u * rd))
            q_inf = jnp.maximum(amax(q_states), amax(q_inputs))
            dual_norm = jnp.maximum(jnp.maximum(px_inf, aty_inf), q_inf)

            normalized_pri = pri_res / (pri_norm + eps)
            normalized_dual = dual_res / (dual_norm + eps)
            new_rho = rho_b * jnp.sqrt(normalized_pri
                                       / (normalized_dual + eps))
            if adaptive_rho_clipping:
                new_rho = jnp.clip(new_rho, jnp.float32(adaptive_rho_min),
                                   jnp.float32(adaptive_rho_max))
            return new_rho

        def one_iter(i, update_slot, check):
            rho_b = rho_s[...]                       # (1, Bt)
            drho = rho_b - rho0

            R1 = _dot(T1s, vec1_s[...])
            ux = R1[order * (su + sx):]
            for k in range(order - 1, -1, -1):
                ux = ux * drho + R1[k * (su + sx):(k + 1) * (su + sx)]
            u = ux[:su]
            x = ux[su:]

            z = uout_r[...]
            v = xout_r[...]
            if alpha != 1.0:
                u_hat = alpha * u + (1.0 - alpha) * z
                x_hat = alpha * x + (1.0 - alpha) * v
            else:
                u_hat, x_hat = u, x
            znew = u_hat + y_s[...]
            if en_input_bound:
                znew = jnp.minimum(umax, jnp.maximum(umin, znew))
            if state_free:
                vnew = x_hat
            else:
                vnew = x_hat + g_s[...]
                if en_state_bound:
                    vnew = jnp.minimum(xmax, jnp.maximum(xmin, vnew))
            # composition order: box -> linear -> SOC (ops/condensed.py)
            for refs_j in lin_u_refs:
                znew = apply_lin(znew, refs_j, _dot)
            for refs_j in lin_x_refs:
                vnew = apply_lin(vnew, refs_j, _dot)
            for refs_j in soc_u_refs:
                znew = apply_soc(znew, refs_j, _dot)
            for refs_j in soc_x_refs:
                vnew = apply_soc(vnew, refs_j, _dot)

            prev = conv_s[...] != 0
            y_new = jnp.where(prev, y_s[...], y_s[...] + u_hat - znew)
            y_s[...] = y_new
            if not state_free:
                g_new = jnp.where(prev, g_s[...], g_s[...] + x_hat - vnew)
                g_s[...] = g_new

            if update_slot:
                # reference gate: i > 0 and i % 5 == 0; converged lanes
                # keep their rho
                if osqp_ctrl:
                    pred = predict(x, u, znew, vnew, y_new, drho, rho_b)
                else:
                    # termination controller (ops/rho.termination_controller
                    # semantics) from the in-vreg iterates: v/z are the
                    # PREVIOUS slacks (read before this iteration's commit)
                    def amax2(t):
                        return jnp.max(jnp.abs(t), axis=0)[None, :]
                    pri = jnp.maximum(amax2(x - vnew), amax2(u - znew))
                    dua = rho_b * jnp.maximum(amax2(v - vnew),
                                              amax2(z - znew))
                    ratio = ((pri / pri_tol)
                             / (dua / dua_tol + eps))
                    factor = jnp.clip(jnp.sqrt(ratio),
                                      jnp.float32(1.0 / TERM_MAX_STEP),
                                      jnp.float32(TERM_MAX_STEP))
                    move = jnp.logical_or(
                        factor > jnp.float32(TERM_DEADBAND),
                        factor < jnp.float32(1.0 / TERM_DEADBAND))
                    pred = jnp.where(move, rho_b * factor, rho_b)
                    if adaptive_rho_clipping:
                        pred = jnp.clip(pred,
                                        jnp.float32(adaptive_rho_min),
                                        jnp.float32(adaptive_rho_max))
                    if np.isfinite(taylor_trust):
                        tr = jnp.float32(taylor_trust)
                        pred = jnp.clip(pred, rho0 - tr, rho0 + tr)
                do = jnp.logical_and(i > 0, jnp.logical_not(prev))
                rho_new = jnp.where(do, pred, rho_b)
            else:
                rho_new = rho_b
            drho_new = rho_new - rho0

            if check:
                # termination: duals scale by the POST-update rho
                ps = jnp.max(jnp.abs(x - vnew), axis=0)[None, :]
                pi = jnp.max(jnp.abs(u - znew), axis=0)[None, :]
                ds = jnp.max(jnp.abs(v - vnew), axis=0)[None, :] * rho_new
                di = jnp.max(jnp.abs(z - znew), axis=0)[None, :] * rho_new
                ok = ((ps < pri_tol) & (pi < pri_tol)
                      & (ds < dua_tol) & (di < dua_tol))
                newly = jnp.logical_and(ok, jnp.logical_not(prev))

                iters_r[...] = jnp.where(newly, i + 1, iters_r[...])
                solved_r[...] = jnp.where(newly, 1, solved_r[...])
                conv_all = jnp.logical_or(prev, newly)
                conv_s[...] = conv_all.astype(jnp.int32)
            else:
                conv_all = prev

            xout_r[...] = jnp.where(prev, v, vnew)
            uout_r[...] = jnp.where(prev, z, znew)
            if carry_out:
                # carry v/z do NOT advance on the converging iteration
                vco_r[...] = jnp.where(conv_all, vco_r[...], vnew)
                zco_r[...] = jnp.where(conv_all, zco_r[...], znew)

            # backward: cost fold at PRE-update rho, gain K at POST-update
            vec2_s[:su] = znew - y_new
            vec2_s[su:su + sx] = vnew if state_free else vnew - g_new
            R2 = _dot(T2s, vec2_s[...])
            d_new = (R2[:su] + drho * R2[su:2 * su]
                     + drho_new * R2[2 * su:3 * su]
                     + (drho * drho_new) * R2[3 * su:])
            vec1_s[:su] = jnp.where(conv_all, vec1_s[:su], d_new)
            rho_s[...] = rho_new

            return jnp.all(conv_all) if check else jnp.bool_(False)

        def body(carry):
            i, _ = carry
            done = jnp.bool_(False)
            for k in range(STEP):
                # rho-update slots at k % 5 == 0 (fires only when the traced
                # absolute iteration i + k > 0); residual checks every ct-th
                done = one_iter(i + k, k % RHO_INTERVAL == 0,
                                (k + 1) % ct == 0)
            return (i + STEP, done)

        def cond(carry):
            i, done = carry
            return jnp.logical_and(i < max_iter, jnp.logical_not(done))

        lax.while_loop(cond, body, (jnp.int32(0), jnp.bool_(False)))

        rho_r[...] = rho_s[...]
        if carry_out:
            dco_r[...] = vec1_s[:su]
            yco_r[...] = y_s[...]
            if not state_free:
                gco_r[...] = g_s[...]

    def gspec(rows, cols):
        """Group-indexed (1, rows, cols) block of a (G, rows, cols) array."""
        return pl.BlockSpec((1, rows, cols), lambda g, t: (g, 0, 0),
                            memory_space=pltpu.VMEM)

    @jax.jit
    def solve_fn(tmaps: CondensedTaylorMaps, u_min, u_max, x_min, x_max,
                 x0s, warm: AdaptiveFusedCarry = None):
        f32 = jnp.float32
        if x0s.ndim == 3:
            # grouped layout (G, L, nx) — also valid at G == 1
            assert x0s.shape[0] == G, \
                f"grouped solver needs x0s (G={G}, L, nx); got {x0s.shape}"
            x0s = x0s.reshape(G * x0s.shape[1], x0s.shape[2])
        elif G > 1:
            assert x0s.shape[0] % G == 0, \
                f"flat x0s batch {x0s.shape[0]} not divisible by G={G}"
        Btot = x0s.shape[0]
        assert Btot % (G * Bt) == 0, \
            f"batch {Btot} not a multiple of groups*tile {G}*{Bt}"
        tpg = Btot // (G * Bt)  # lane tiles per group

        def tile_spec(rows):
            return pl.BlockSpec((rows, Bt), lambda g, t: (0, g * tpg + t),
                                memory_space=pltpu.VMEM)

        T1s = tmaps.T1s.astype(f32)
        if T1s.ndim == 3:
            T1s = jnp.broadcast_to(T1s[None], (G,) + T1s.shape)
        order = T1s.shape[1] - 1
        T1stk = T1s.reshape(G, (order + 1) * (su + sx), in1)
        T2s = tmaps.T2s.astype(f32)
        if T2s.ndim == 3:
            T2s = jnp.broadcast_to(T2s[None], (G,) + T2s.shape)
        T2stk = jnp.concatenate([T2s[..., :su + sx], T2s[..., -1:]],
                                axis=-1).reshape(G, 4 * su, in2r)

        def bound(b, rows):
            b = jnp.asarray(b, f32)
            if b.size == G * rows:
                return b.reshape(G, rows, 1)
            return jnp.broadcast_to(b.reshape(rows, 1), (G, rows, 1))

        args = [
            T1stk, T2stk,
            jnp.broadcast_to(tmaps.rho0.astype(f32).reshape(-1, 1, 1),
                             (G, 1, 1)),
            bound(u_min, su), bound(u_max, su),
            bound(x_min, sx), bound(x_max, sx),
        ]
        if osqp_ctrl:
            args += [jnp.asarray(Dx_m), jnp.asarray(Du_m)]
            if not state_free:
                args += [jnp.asarray(Gx_m), jnp.asarray(Gu_m)]
            args += [jnp.asarray(qstk), jnp.asarray(rstk),
                     jnp.asarray(P0_m), jnp.asarray(dP_m)]
        in_specs = [gspec(a.shape[1], a.shape[2]) for a in args]
        shared = pl.BlockSpec(memory_space=pltpu.VMEM)
        cargs, cspecs = constraint_args_specs(
            soc_u_mats, soc_x_mats, lin_u_mats, lin_x_mats, G, gspec, shared)
        assert len(cargs) == n_cref
        args += cargs + [x0s.T.astype(f32)]
        in_specs += cspecs + [tile_spec(nx)]
        if warm_start:
            if warm is None:
                raise ValueError("warm_start solver needs the warm carry")
            d0, y0, g0, v0, z0, rhoc = (w.astype(f32) for w in warm)
            if state_free:
                # g slot is interface-compat only (identically zero)
                args += [d0, y0, v0, z0, rhoc]
                in_specs += [tile_spec(su), tile_spec(su), tile_spec(sx),
                             tile_spec(su), tile_spec(1)]
            else:
                args += [d0, y0, g0, v0, z0, rhoc]
                in_specs += [tile_spec(su), tile_spec(su), tile_spec(sx),
                             tile_spec(sx), tile_spec(su), tile_spec(1)]
        elif warm is not None:
            raise ValueError("pass warm only to a warm_start=True solver")
        out_specs = [tile_spec(sx), tile_spec(su), tile_spec(1),
                     tile_spec(1), tile_spec(1)]
        out_shape = [
            jax.ShapeDtypeStruct((sx, Btot), f32),
            jax.ShapeDtypeStruct((su, Btot), f32),
            jax.ShapeDtypeStruct((1, Btot), jnp.int32),
            jax.ShapeDtypeStruct((1, Btot), jnp.int32),
            jax.ShapeDtypeStruct((1, Btot), f32),
        ]
        if carry_out:
            carry_dims = ([su, su, sx, su] if state_free
                          else [su, su, sx, sx, su])
            out_specs += [tile_spec(d) for d in carry_dims]
            out_shape += [jax.ShapeDtypeStruct((d, Btot), f32)
                          for d in carry_dims]
        scratch_shapes = [pltpu.VMEM((su, Bt), f32)]       # y
        if not state_free:
            scratch_shapes.append(pltpu.VMEM((sx, Bt), f32))  # g
        scratch_shapes += [
            pltpu.VMEM((in1, Bt), f32),   # vec1 = [d; x0; 1]
            pltpu.VMEM((in2r, Bt), f32),  # vec2 = [znew - y; vnew - g; 1]
            pltpu.VMEM((1, Bt), f32),     # rho
            pltpu.VMEM((1, Bt), jnp.int32),  # conv
        ]
        out = pl.pallas_call(
            kernel,
            grid=(G, tpg),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(*args)
        vs, zs, iters, solved, rho = out[:5]
        Bn = Btot
        res = (vs.T.reshape(Bn, N, nx), zs.T.reshape(Bn, N - 1, nu),
               iters[0], solved[0], rho[0])
        if carry_out:
            if state_free:
                dc, yc, vc, zc = out[5:9]
                gc = jnp.zeros((sx, Btot), f32)
                return res + (AdaptiveFusedCarry(dc, yc, gc, vc, zc, rho),)
            return res + (AdaptiveFusedCarry(out[5], out[6], out[7],
                                             out[8], out[9], rho),)
        return res

    return solve_fn
