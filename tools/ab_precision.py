#!/usr/bin/env python3
"""Precision staging A/B on the headline cartpole pipeline (VERDICT r4
item 3): does a cheap bf16 (Precision.DEFAULT, one MXU pass) phase-0 that
drives iterates near the fixed point, followed by a warm HIGHEST polish,
beat the all-HIGHEST two-phase pipeline at equal 1e-3 tolerance?

Background (docs/DESIGN.md §5): the kernel is MXU-bound at ~84% of bf16
peak BECAUSE f32 HIGHEST costs 6 MXU passes; bf16 matmul noise stalls ADMM
convergence at ~1e-2, so bf16 alone cannot reach 1e-3 — the question is
whether bf16-to-1e-2 + HIGHEST-to-1e-3 nets out faster.

Configs interleaved in ONE process (CLAUDE.md timing rule), device-loop
timed:

  A        fn1(HIGHEST, 76, carry) -> compact -> fn2(HIGHEST, 324, warm)
  B(k)     fn0(DEFAULT, k, carry) -> fn1'(HIGHEST, warm+carry, j) ->
           compact -> fn2(HIGHEST, warm)

Usage: python tools/ab_precision.py [--quick]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from tinympc_julia_tpu import make_problem, precompute_cache
    from tinympc_julia_tpu.models import cartpole
    from tinympc_julia_tpu.ops.condensed import build_condensed
    from tinympc_julia_tpu.ops.pallas.condensed_kernel import (
        make_condensed_fused_solver)
    import bench

    QUICK = "--quick" in sys.argv
    dtype = jnp.float32
    N = cartpole.HORIZON
    B = 8192 if QUICK else 65536
    B2 = 2048 if QUICK else 8192
    ALPHA = 1.7

    p = make_problem(jnp.asarray(cartpole.A, dtype),
                     jnp.asarray(cartpole.B, dtype),
                     jnp.asarray(np.diag(cartpole.Q_DIAG), dtype),
                     jnp.asarray(np.diag(cartpole.R_DIAG), dtype),
                     cartpole.RHO, N, u_min=-5.0, u_max=5.0)
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(cartpole.RHO, dtype))
    maps = build_condensed(p, c)
    bounds = (p.u_min, p.u_max, p.x_min, p.x_max)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, size=(B, 4)), dtype)
    kw = dict(en_input_bound=True, en_state_bound=False,
              relaxation_alpha=ALPHA, check_termination=4)

    def build_a(p1=76, p2=324):
        fn1 = make_condensed_fused_solver(4, 1, N, batch_tile=2048,
                                          max_iter=p1, carry_out=True, **kw)
        fn2 = make_condensed_fused_solver(4, 1, N, batch_tile=min(1024, B2),
                                          max_iter=p2, warm_start=True, **kw)

        @jax.jit
        def pipe(x0s):
            _, _, it1, ok1, carry = fn1(maps, c.rho, *bounds, x0s)
            unconv = ok1 == 0
            idx = jnp.nonzero(unconv, size=B2, fill_value=0)[0]
            warm = tuple(w[:, idx] for w in carry)
            _, _, it2, ok2 = fn2(maps, c.rho, *bounds, x0s[idx], warm)
            return it1, ok1, idx, it2, ok2, unconv
        return pipe

    def build_b(k0, p1, p2=324):
        fn0 = make_condensed_fused_solver(
            4, 1, N, batch_tile=2048, max_iter=k0, carry_out=True,
            precision=jax.lax.Precision.DEFAULT, **kw)
        fn1 = make_condensed_fused_solver(4, 1, N, batch_tile=2048,
                                          max_iter=p1, warm_start=True,
                                          carry_out=True, **kw)
        fn2 = make_condensed_fused_solver(4, 1, N, batch_tile=min(1024, B2),
                                          max_iter=p2, warm_start=True, **kw)

        @jax.jit
        def pipe(x0s):
            _, _, it0, ok0, carry0 = fn0(maps, c.rho, *bounds, x0s)
            _, _, it1, ok1, carry1 = fn1(maps, c.rho, *bounds, x0s, carry0)
            ok01 = jnp.maximum(ok0, ok1)
            unconv = ok01 == 0
            idx = jnp.nonzero(unconv, size=B2, fill_value=0)[0]
            warm = tuple(w[:, idx] for w in carry1)
            _, _, it2, ok2 = fn2(maps, c.rho, *bounds, x0s[idx], warm)
            return it1, ok01, idx, it2, ok2, unconv
        return pipe

    def measure(name, pipe, reps):
        out = pipe(x0s)
        it1, ok1, idx, it2, ok2, unconv = (np.asarray(o) for o in out)
        n1 = int(ok1.sum())
        nun = int(unconv.sum())
        mask2 = np.zeros(it2.size, bool)
        mask2[:min(nun, it2.size)] = True
        n2 = int(ok2[mask2].sum())
        n_conv = n1 + n2
        t = bench._device_loop_time(
            pipe, x0s,
            lambda o: (jnp.sum(o[1]) + jnp.sum(o[4])).astype(jnp.float32),
            reps)
        print(f"{name:26s} {n_conv}/{B} ({100.0 * n_conv / B:6.2f}%)  "
              f"{t * 1e3:7.2f} ms  {n_conv / t:12.0f} solves/s "
              f"[{nun} stragglers]", flush=True)
        return n_conv / t

    reps = 3 if QUICK else 8
    # interleave: A, B-variants, A again (drift check)
    pipes = [("A 76H+324H (r4 config)", build_a())]
    for k0, p1 in ((32, 48), (64, 32), (96, 32), (96, 16), (128, 16)):
        pipes.append((f"B {k0}bf16+{p1}H+324H", build_b(k0, p1)))
    pipes.append(("A repeat (drift check)", build_a()))
    t0 = time.time()
    for name, pipe in pipes:
        measure(name, pipe, reps)
    print(f"total {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
