"""Fused VMEM-resident batched ADMM solver (Pallas TPU kernel).

The XLA path streams ~12 workspace arrays through HBM every ADMM iteration
(~4x off the HBM roofline at large batch).  This kernel keeps the ENTIRE
workspace of a batch tile in VMEM for the whole solve: HBM traffic is one
x0 read + one solution write per tile, and every iteration runs out of VMEM
at VPU/MXU speed (SURVEY.md §7 step 6: 'speed-of-light per chip').

Layout: batch in lanes.  Stage arrays are (N, nx, Bt) / (N-1, nu, Bt) VMEM
scratch — each stage slice is an aligned (nx, Bt) tile, each per-stage matmul
is a (nx, nx) x (nx, Bt) MXU op.

Scope (box-constrained throughput solves — the benchmark workload):
  * shared Problem across the batch, shared references
  * fresh solves (zero workspace, per-instance x0)
  * per-lane convergence latching: each lane's solution/iteration count is
    captured the first time its residuals pass (reference termination
    semantics, admm.cpp:89-107); latched lanes keep computing harmlessly
    until the tile's while-loop exits (all converged or max_iter).

General constraints (SOC/linear), warm starts, and per-instance problems stay
on the XLA path (ops/admm.py, parallel/batch.py).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def make_fused_solver(nx: int, nu: int, N: int, *, batch_tile: int = 512,
                      max_iter: int = 100, abs_pri_tol: float = 1e-3,
                      abs_dua_tol: float = 1e-3, en_state_bound: bool = False,
                      en_input_bound: bool = True, check_termination: int = 1,
                      interpret: bool = False):
    """Build a jitted fused solver.

    Returns solve_fn(A, B, f, Qd, Rd, rho, Kinf, Quu_inv, AmBKt, Pinf,
                     x_min, x_max, u_min, u_max, Xref, Uref, x0s)
      -> (x (B,N,nx), u (B,N-1,nu), iters (B,), solved (B,))
    where x0s is (B, nx) with B a multiple of batch_tile; bounds are
    (N, nx) / (N-1, nu) shared across the batch; solutions are the slack
    iterates (reference semantics).
    """
    Bt = batch_tile
    Nm1 = N - 1

    def kernel(A_r, Bm_r, BT_r, f_r, Qd_r, Rd_r, rho_r, K_r, KT_r, Quu_r,
               Am_r, PT_r, xmin_r, xmax_r, umin_r, umax_r, qref_r, rref_r,
               pNref_r, x0_r,
               xout_r, uout_r, iters_r, solved_r,
               x_s, u_s, q_s, r_s, p_s, d_s, v_s, vn_s, z_s, zn_s, g_s, y_s,
               conv_s, it_s):
        A = A_r[...]
        Bm = Bm_r[...]
        BmT = BT_r[...]
        fvec = f_r[...]          # (nx, 1)
        Qd = Qd_r[...]           # (nx, 1)
        Rd = Rd_r[...]           # (nu, 1)
        rho = rho_r[0, 0]
        K = K_r[...]
        KT = KT_r[...]
        Quu = Quu_r[...]
        Am = Am_r[...]
        PT = PT_r[...]

        # --- zero-init workspace; x0 into stage 0 ---
        for ref in (u_s, r_s, d_s, z_s, zn_s, y_s):
            ref[...] = jnp.zeros_like(ref)
        for ref in (x_s, q_s, p_s, v_s, vn_s, g_s):
            ref[...] = jnp.zeros_like(ref)
        x_s[0] = x0_r[...]
        conv_s[...] = jnp.zeros_like(conv_s)
        it_s[...] = jnp.zeros_like(it_s)
        iters_r[...] = jnp.full_like(iters_r, max_iter)
        solved_r[...] = jnp.zeros_like(solved_r)

        pri_tol = jnp.float32(abs_pri_tol)
        dua_tol = jnp.float32(abs_dua_tol)

        def body(carry):
            i, _ = carry

            # forward pass (admm.cpp:25-35)
            def fwd(k, _):
                xi = x_s[k]
                ui = -_dot(K, xi) - d_s[k]
                u_s[k] = ui
                x_s[k + 1] = _dot(A, xi) + _dot(Bm, ui) + fvec
                return 0
            lax.fori_loop(0, Nm1, fwd, 0, unroll=True)

            # slack update + projection (admm.cpp:43-59)
            zn = u_s[...] + y_s[...]
            if en_input_bound:
                zn = jnp.minimum(umax_r[...], jnp.maximum(umin_r[...], zn))
            zn_s[...] = zn
            vn = x_s[...] + g_s[...]
            if en_state_bound:
                vn = jnp.minimum(xmax_r[...], jnp.maximum(xmin_r[...], vn))
            vn_s[...] = vn

            # dual ascent (admm.cpp:65-69)
            y_s[...] = y_s[...] + u_s[...] - zn
            g_s[...] = g_s[...] + x_s[...] - vn

            # linear cost (admm.cpp:75-83); qref/rref = -Xref*Q, -Uref*R
            r_s[...] = rref_r[...] - rho * (zn - y_s[...])
            q_s[...] = qref_r[...] - rho * (vn - g_s[...])
            p_s[Nm1] = pNref_r[...] - rho * (vn[Nm1] - g_s[Nm1])

            # termination (admm.cpp:89-107) with per-lane latching
            ps = jnp.max(jnp.max(jnp.abs(x_s[...] - vn), axis=1), axis=0)
            pi = jnp.max(jnp.max(jnp.abs(u_s[...] - zn), axis=1), axis=0)
            ds = jnp.max(jnp.max(jnp.abs(v_s[...] - vn), axis=1), axis=0) * rho
            di = jnp.max(jnp.max(jnp.abs(z_s[...] - zn), axis=1), axis=0) * rho
            ok = ((ps < pri_tol) & (pi < pri_tol)
                  & (ds < dua_tol) & (di < dua_tol))[None, :]
            if check_termination > 1:
                ok = jnp.logical_and(ok, ((i + 1) % check_termination) == 0)
            prev_conv = conv_s[...] != 0
            newly = jnp.logical_and(ok, jnp.logical_not(prev_conv))

            # latch solutions/iters for newly converged lanes
            xout_r[...] = jnp.where(newly[None], vn, xout_r[...])
            uout_r[...] = jnp.where(newly[None], zn, uout_r[...])
            iters_r[...] = jnp.where(newly, i + 1, iters_r[...])
            solved_r[...] = jnp.where(newly, 1, solved_r[...])
            conv_all = jnp.logical_or(prev_conv, newly)
            conv_s[...] = conv_all.astype(jnp.int32)

            # slack history + backward pass (admm.cpp:195-199)
            v_s[...] = vn
            z_s[...] = zn

            def bwd(k_, _):
                k = Nm1 - 1 - k_
                pk1 = p_s[k + 1]
                rk = r_s[k]
                d_s[k] = _dot(Quu, _dot(BmT, pk1) + rk)
                p_s[k] = q_s[k] + _dot(Am, pk1) - _dot(KT, rk)
                return 0
            lax.fori_loop(0, Nm1, bwd, 0, unroll=True)

            return (i + 1, jnp.all(conv_all))

        def cond(carry):
            i, done = carry
            return jnp.logical_and(i < max_iter, jnp.logical_not(done))

        lax.while_loop(cond, body, (jnp.int32(0), jnp.bool_(False)))

        # unconverged lanes: current slack iterates, solved=0 (admm.cpp:202-206)
        conv = conv_s[...] != 0
        xout_r[...] = jnp.where(conv[None], xout_r[...], vn_s[...])
        uout_r[...] = jnp.where(conv[None], uout_r[...], zn_s[...])

    shared = pl.BlockSpec(memory_space=pltpu.VMEM)

    @functools.partial(jax.jit, static_argnames=())
    def solve_fn(A, B, f, Qd, Rd, rho, Kinf, Quu_inv, AmBKt, Pinf,
                 x_min, x_max, u_min, u_max, Xref, Uref, x0s):
        Btot = x0s.shape[0]
        assert Btot % Bt == 0, f"batch {Btot} not multiple of tile {Bt}"
        n_tiles = Btot // Bt
        f32 = jnp.float32

        A = A.astype(f32)
        Bm = B.astype(f32)
        qref = (-(Xref * Qd)[..., None]).astype(f32)          # (N, nx, 1)
        rref = (-(Uref * Rd)[..., None]).astype(f32)          # (N-1, nu, 1)
        pNref = (-(Pinf.T @ Xref[-1]))[:, None].astype(f32)   # (nx, 1)

        args = (
            A, Bm, Bm.T.astype(f32), jnp.asarray(f, f32)[:, None],
            jnp.asarray(Qd, f32)[:, None], jnp.asarray(Rd, f32)[:, None],
            jnp.asarray(rho, f32)[None, None],
            Kinf.astype(f32), Kinf.T.astype(f32), Quu_inv.astype(f32),
            AmBKt.astype(f32), Pinf.T.astype(f32),
            x_min[..., None].astype(f32), x_max[..., None].astype(f32),
            u_min[..., None].astype(f32), u_max[..., None].astype(f32),
            qref, rref, pNref,
            x0s.T.astype(f32),                                # (nx, Btot)
        )

        in_specs = [shared] * 19 + [
            pl.BlockSpec((nx, Bt), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ]
        out_specs = (
            pl.BlockSpec((N, nx, Bt), lambda t: (0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Nm1, nu, Bt), lambda t: (0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bt), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bt), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        )
        out_shape = (
            jax.ShapeDtypeStruct((N, nx, Btot), f32),
            jax.ShapeDtypeStruct((Nm1, nu, Btot), f32),
            jax.ShapeDtypeStruct((1, Btot), jnp.int32),
            jax.ShapeDtypeStruct((1, Btot), jnp.int32),
        )
        scratch_shapes = [
            pltpu.VMEM((N, nx, Bt), f32),    # x
            pltpu.VMEM((Nm1, nu, Bt), f32),  # u
            pltpu.VMEM((N, nx, Bt), f32),    # q
            pltpu.VMEM((Nm1, nu, Bt), f32),  # r
            pltpu.VMEM((N, nx, Bt), f32),    # p
            pltpu.VMEM((Nm1, nu, Bt), f32),  # d
            pltpu.VMEM((N, nx, Bt), f32),    # v
            pltpu.VMEM((N, nx, Bt), f32),    # vnew
            pltpu.VMEM((Nm1, nu, Bt), f32),  # z
            pltpu.VMEM((Nm1, nu, Bt), f32),  # znew
            pltpu.VMEM((N, nx, Bt), f32),    # g
            pltpu.VMEM((Nm1, nu, Bt), f32),  # y
            pltpu.VMEM((1, Bt), jnp.int32),  # conv
            pltpu.VMEM((1, Bt), jnp.int32),  # it
        ]

        xs, us, iters, solved = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(*args)

        return (jnp.transpose(xs, (2, 0, 1)), jnp.transpose(us, (2, 0, 1)),
                iters[0], solved[0])

    return solve_fn
