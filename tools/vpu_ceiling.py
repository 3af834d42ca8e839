#!/usr/bin/env python3
"""Measure the cartpole fused kernel's VPU issue ceiling FOR REAL
(VERDICT r3 item 2): instead of the round-3 analytic ~1-vreg-op/cycle
model, run component kernels at the exact kernel shapes and compare.

Four interleaved measurements (round-robin reps, one jitted dispatch each,
tolerance 0 so every lane runs exactly max_iter iterations):

  full      — the shipped kernel (state_free specialization active)
  generic   — the same kernel with the g machinery forced back in
              (_disable_state_free=True; the round-3 headline kernel)
  mxu-only  — the fused matmul chain alone (dependent, like the solve)
  vpu-only  — the state_free elementwise chain alone (no matmul)

If full ~ mxu+vpu the kernel is issue-serialized; the gap full-vs-generic
is the measured value of dropping the state-dual ops; vpu-only is the
measured elementwise ceiling the analytic model guessed at.

Writes one line per config to stdout.  Diagnostics only (not a test).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 400
REPS = 8


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from tinympc_julia_tpu import make_problem, precompute_cache
    from tinympc_julia_tpu.models import cartpole
    from tinympc_julia_tpu.ops.condensed import build_condensed
    from tinympc_julia_tpu.ops.pallas.condensed_kernel import (
        _make_dot, make_condensed_fused_solver)

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    dtype = jnp.float32
    N = cartpole.HORIZON
    nx, nu = 4, 1
    su, sx = (N - 1) * nu, N * nx
    sw = su + sx
    Bt = 2048
    B = 65536
    n_tiles = B // Bt

    p = make_problem(jnp.asarray(cartpole.A, dtype),
                     jnp.asarray(cartpole.B, dtype),
                     jnp.asarray(np.diag(cartpole.Q_DIAG), dtype),
                     jnp.asarray(np.diag(cartpole.R_DIAG), dtype),
                     cartpole.RHO, N, u_min=-5.0, u_max=5.0)
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(cartpole.RHO, dtype))
    maps = build_condensed(p, c)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, size=(B, 4)), dtype)
    bounds = (p.u_min, p.u_max, p.x_min, p.x_max)

    # tolerance 0: no lane ever converges -> exactly ITERS iterations/lane
    kw = dict(en_input_bound=True, en_state_bound=False,
              relaxation_alpha=1.7, check_termination=4, max_iter=ITERS,
              abs_pri_tol=0.0, abs_dua_tol=0.0, batch_tile=Bt)
    fn_full = make_condensed_fused_solver(nx, nu, N, **kw)
    fn_gen = make_condensed_fused_solver(nx, nu, N, _disable_state_free=True,
                                         **kw)

    _dot = _make_dot(jax.lax.Precision.HIGHEST)
    T12w = jnp.asarray(np.asarray(maps.T12, np.float32)[:, :sw])
    umin, umax = -5.0, 5.0  # scalar bounds: same VPU op mix as the kernel

    def mxu_kernel(T_r, w0_r, out_r, w_s):
        """The dependent matmul chain alone: w <- 0.5 * (T12w @ w)."""
        w_s[...] = w0_r[...]

        def body(i, _):
            w_s[...] = 0.5 * _dot(T_r[...], w_s[...])
            return 0

        lax.fori_loop(0, ITERS, body, 0)
        out_r[...] = w_s[...]

    def vpu_kernel(w0_r, xout_r, uout_r, y_s, w2_s, uxc_s, conv_s):
        """The state_free elementwise chain alone (per-iteration VPU op mix
        of the shipped kernel, check every 4th), matmul replaced by a
        scratch read."""
        w2_s[...] = w0_r[...]
        y_s[...] = jnp.zeros_like(y_s)
        uxc_s[...] = w0_r[...] * 0.25
        conv_s[...] = jnp.zeros_like(conv_s)
        xout_r[...] = jnp.zeros_like(xout_r)
        uout_r[...] = jnp.zeros_like(uout_r)
        alpha = 1.7

        def one_iter(check):
            ux = w2_s[...] * 0.99 + uxc_s[...]  # stand-in for the matmul
            u = ux[:su]
            x = ux[su:]
            z = uout_r[...]
            v = xout_r[...]
            u_hat = alpha * u + (1.0 - alpha) * z
            x_hat = alpha * x + (1.0 - alpha) * v
            znew = u_hat + y_s[:su]
            znew = jnp.minimum(umax, jnp.maximum(umin, znew))
            vnew = x_hat
            prev = conv_s[...] != 0
            y_new = jnp.where(prev, y_s[:su], y_s[:su] + u_hat - znew)
            y_s[:su] = y_new
            if check:
                ps = jnp.max(jnp.abs(x - vnew), axis=0)
                pi = jnp.max(jnp.abs(u - znew), axis=0)
                ds = jnp.max(jnp.abs(v - vnew), axis=0)
                di = jnp.max(jnp.abs(z - znew), axis=0)
                ok = ((ps < 0.0) & (pi < 0.0) & (ds < 0.0)
                      & (di < 0.0))[None, :]
                newly = jnp.logical_and(ok, jnp.logical_not(prev))
                conv_all = jnp.logical_or(prev, newly)
                conv_s[...] = conv_all.astype(jnp.int32)
            else:
                conv_all = prev
            xout_r[...] = jnp.where(prev, v, vnew)
            uout_r[...] = jnp.where(prev, z, znew)
            w2_s[:su] = jnp.where(conv_all, w2_s[:su], znew - y_new)
            w2_s[su:] = jnp.where(conv_all, w2_s[su:], vnew)

        def body(i, _):
            for k in range(4):
                one_iter(k == 3)
            return 0

        lax.fori_loop(0, ITERS // 4, body, 0)

    f32 = jnp.float32
    w0 = jnp.asarray(rng.normal(size=(sw, B)).astype(np.float32))

    def tile_spec(rows):
        return pl.BlockSpec((rows, Bt), lambda t: (0, t),
                            memory_space=pltpu.VMEM)

    shared = pl.BlockSpec(memory_space=pltpu.VMEM)

    @jax.jit
    def run_mxu(w0):
        return pl.pallas_call(
            mxu_kernel, grid=(n_tiles,),
            in_specs=[shared, tile_spec(sw)],
            out_specs=tile_spec(sw),
            out_shape=jax.ShapeDtypeStruct((sw, B), f32),
            scratch_shapes=[pltpu.VMEM((sw, Bt), f32)],
        )(T12w, w0)

    @jax.jit
    def run_vpu(w0):
        return pl.pallas_call(
            vpu_kernel, grid=(n_tiles,),
            in_specs=[tile_spec(sw)],
            out_specs=(tile_spec(sx), tile_spec(su)),
            out_shape=(jax.ShapeDtypeStruct((sx, B), f32),
                       jax.ShapeDtypeStruct((su, B), f32)),
            scratch_shapes=[pltpu.VMEM((su, Bt), f32),
                            pltpu.VMEM((sw, Bt), f32),
                            pltpu.VMEM((sw, Bt), f32),
                            pltpu.VMEM((1, Bt), jnp.int32)],
        )(w0)

    @jax.jit
    def run_full(x0s):
        return fn_full(maps, c.rho, *bounds, x0s)

    @jax.jit
    def run_gen(x0s):
        return fn_gen(maps, c.rho, *bounds, x0s)

    configs = {
        "full(state_free)": (run_full, x0s, lambda o: o[2]),
        "generic(r3 kernel)": (run_gen, x0s, lambda o: o[2]),
        "mxu-only": (run_mxu, w0, lambda o: o[0:1, 0:4]),
        "vpu-only": (run_vpu, w0, lambda o: o[1][0:1, 0:4]),
    }

    # warm-up + correctness sanity
    for name, (fn, arg, sync) in configs.items():
        out = fn(arg)
        np.asarray(sync(out))

    times = {k: [] for k in configs}
    for rep in range(REPS):
        for name, (fn, arg, sync) in configs.items():
            t0 = time.perf_counter()
            for _ in range(4):
                out = fn(arg)
            np.asarray(sync(out))
            times[name].append((time.perf_counter() - t0) / 4)

    lane_iters = float(B) * ITERS
    print(f"shape: cartpole sw={sw}, Bt={Bt}, B={B}, iters={ITERS} "
          f"(tol=0: no convergence)")
    meds = {}
    for name in configs:
        t = float(np.median(times[name]))
        meds[name] = t
        per_tile_iter = t / (n_tiles * ITERS) * 1e6
        print(f"{name:20s} median {t * 1e3:7.2f} ms  "
              f"{lane_iters / t:.3e} lane-iters/s  "
              f"{per_tile_iter:6.3f} us/tile-iteration")
    tf, tg = meds["full(state_free)"], meds["generic(r3 kernel)"]
    tm, tv = meds["mxu-only"], meds["vpu-only"]
    print(f"state_free speedup vs r3 kernel: {tg / tf:.3f}x")
    print(f"decomposition: mxu {tm * 1e3:.1f} + vpu {tv * 1e3:.1f} = "
          f"{(tm + tv) * 1e3:.1f} ms vs full {tf * 1e3:.1f} ms "
          f"({100 * (tm + tv) / tf:.0f}% — ~100% means issue-serialized, "
          f"full is at the measured component ceiling)")


if __name__ == "__main__":
    main()
