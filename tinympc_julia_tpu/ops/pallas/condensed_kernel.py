"""Pallas fused condensed solver: VMEM-resident condensed ADMM iterations.

Combines the two big wins: the condensed iteration (ops/condensed.py — the
whole ADMM iteration as two dense MXU matmuls + VPU elementwise, no serial
horizon chain) and VMEM residency (the XLA while-loop streams the ~10 carry
arrays through HBM every iteration; here a batch tile's entire carry lives in
VMEM for the whole solve).

Scope: box-constrained fresh solves, shared problem — the benchmark workload.
Semantics identical to ops/condensed.py (per-lane latching of solutions at
first convergence, reference termination residuals).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..condensed import CondensedMaps, build_condensed


def _make_dot(precision):
    def _dot(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision)
    return _dot


def make_condensed_fused_solver(nx: int, nu: int, N: int, *,
                                batch_tile: int = 2048, max_iter: int = 100,
                                abs_pri_tol: float = 1e-3,
                                abs_dua_tol: float = 1e-3,
                                en_state_bound: bool = False,
                                en_input_bound: bool = True,
                                relaxation_alpha: float = 1.0,
                                precision=jax.lax.Precision.HIGHEST,
                                interpret: bool = False):
    """Build a jitted fused condensed solver.

    Returns solve_fn(maps, rho, u_min, u_max, x_min, x_max, x0s) ->
    (x (B,N,nx), u (B,N-1,nu), iters (B,), solved (B,)) with bounds given
    stacked ((N-1)*nu,)/(N*nx,) shared across the batch and x0s (B, nx).
    """
    Bt = batch_tile
    su = (N - 1) * nu
    sx = N * nx
    in1 = su + nx + 1
    in2 = su + sx + su + sx + 1
    alpha = relaxation_alpha
    _dot = _make_dot(precision)

    def kernel(T1_r, T2_r, rho_r, umin_r, umax_r, xmin_r, xmax_r, x0_r,
               xout_r, uout_r, iters_r, solved_r,
               d_s, y_s, g_s, v_s, z_s, vec1_s, vec2_s, conv_s):
        T1 = T1_r[...]
        T2 = T2_r[...]
        rho = rho_r[0, 0]

        for ref in (d_s, y_s, g_s, v_s, z_s):
            ref[...] = jnp.zeros_like(ref)
        conv_s[...] = jnp.zeros_like(conv_s)
        iters_r[...] = jnp.full_like(iters_r, max_iter)
        solved_r[...] = jnp.zeros_like(solved_r)
        vec1_s[...] = jnp.zeros_like(vec1_s)
        vec1_s[su:su + nx] = x0_r[...]
        vec1_s[in1 - 1:in1, :] = jnp.ones_like(vec1_s[in1 - 1:in1, :])
        vec2_s[...] = jnp.zeros_like(vec2_s)
        vec2_s[in2 - 1:in2, :] = jnp.ones_like(vec2_s[in2 - 1:in2, :])

        pri_tol = jnp.float32(abs_pri_tol)
        dua_tol = jnp.float32(abs_dua_tol)

        def body(carry):
            i, _ = carry
            vec1_s[:su] = d_s[...]
            ux = _dot(T1, vec1_s[...])
            u = ux[:su]
            x = ux[su:]

            z = z_s[...]
            v = v_s[...]
            if alpha != 1.0:
                u_hat = alpha * u + (1.0 - alpha) * z
                x_hat = alpha * x + (1.0 - alpha) * v
            else:
                u_hat, x_hat = u, x
            znew = u_hat + y_s[...]
            if en_input_bound:
                znew = jnp.minimum(umax_r[...],
                                   jnp.maximum(umin_r[...], znew))
            vnew = x_hat + g_s[...]
            if en_state_bound:
                vnew = jnp.minimum(xmax_r[...],
                                   jnp.maximum(xmin_r[...], vnew))

            y_s[...] = y_s[...] + u_hat - znew
            g_s[...] = g_s[...] + x_hat - vnew

            ps = jnp.max(jnp.abs(x - vnew), axis=0)
            pi = jnp.max(jnp.abs(u - znew), axis=0)
            ds = jnp.max(jnp.abs(v - vnew), axis=0) * rho
            di = jnp.max(jnp.abs(z - znew), axis=0) * rho
            ok = ((ps < pri_tol) & (pi < pri_tol)
                  & (ds < dua_tol) & (di < dua_tol))[None, :]
            prev = conv_s[...] != 0
            newly = jnp.logical_and(ok, jnp.logical_not(prev))

            xout_r[...] = jnp.where(newly, vnew, xout_r[...])
            uout_r[...] = jnp.where(newly, znew, uout_r[...])
            iters_r[...] = jnp.where(newly, i + 1, iters_r[...])
            solved_r[...] = jnp.where(newly, 1, solved_r[...])
            conv_all = jnp.logical_or(prev, newly)
            conv_s[...] = conv_all.astype(jnp.int32)

            v_s[...] = vnew
            z_s[...] = znew

            vec2_s[:su] = znew
            vec2_s[su:su + sx] = vnew
            vec2_s[su + sx:su + sx + su] = y_s[...]
            vec2_s[su + sx + su:su + sx + su + sx] = g_s[...]
            d_s[...] = _dot(T2, vec2_s[...])

            return (i + 1, jnp.all(conv_all))

        def cond(carry):
            i, done = carry
            return jnp.logical_and(i < max_iter, jnp.logical_not(done))

        lax.while_loop(cond, body, (jnp.int32(0), jnp.bool_(False)))

        conv = conv_s[...] != 0
        xout_r[...] = jnp.where(conv, xout_r[...], v_s[...])
        uout_r[...] = jnp.where(conv, uout_r[...], z_s[...])

    shared = pl.BlockSpec(memory_space=pltpu.VMEM)

    @jax.jit
    def solve_fn(maps: CondensedMaps, rho, u_min, u_max, x_min, x_max, x0s):
        Btot = x0s.shape[0]
        assert Btot % Bt == 0, f"batch {Btot} not a multiple of tile {Bt}"
        f32 = jnp.float32
        args = (
            maps.T1.astype(f32), maps.T2.astype(f32),
            jnp.asarray(rho, f32)[None, None],
            u_min.reshape(su, 1).astype(f32), u_max.reshape(su, 1).astype(f32),
            x_min.reshape(sx, 1).astype(f32), x_max.reshape(sx, 1).astype(f32),
            x0s.T.astype(f32),
        )
        in_specs = [shared] * 7 + [
            pl.BlockSpec((nx, Bt), lambda t: (0, t), memory_space=pltpu.VMEM)]
        out_specs = (
            pl.BlockSpec((sx, Bt), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((su, Bt), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bt), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bt), lambda t: (0, t), memory_space=pltpu.VMEM),
        )
        out_shape = (
            jax.ShapeDtypeStruct((sx, Btot), f32),
            jax.ShapeDtypeStruct((su, Btot), f32),
            jax.ShapeDtypeStruct((1, Btot), jnp.int32),
            jax.ShapeDtypeStruct((1, Btot), jnp.int32),
        )
        scratch_shapes = [
            pltpu.VMEM((su, Bt), f32),   # d
            pltpu.VMEM((su, Bt), f32),   # y
            pltpu.VMEM((sx, Bt), f32),   # g
            pltpu.VMEM((sx, Bt), f32),   # v
            pltpu.VMEM((su, Bt), f32),   # z
            pltpu.VMEM((in1, Bt), f32),  # vec1
            pltpu.VMEM((in2, Bt), f32),  # vec2
            pltpu.VMEM((1, Bt), jnp.int32),  # conv
        ]
        xs, us, iters, solved = pl.pallas_call(
            kernel,
            grid=(Btot // Bt,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(*args)
        B = Btot
        return (xs.T.reshape(B, N, nx), us.T.reshape(B, N - 1, nu),
                iters[0], solved[0])

    return solve_fn
