#!/usr/bin/env python3
"""A/B the GROUPED fused kernel (domain-randomized quadrotor sweep shape,
G=64, sw=316) — diagnostics for the roofline writeup.

Two experiments, interleaved reps (tunnel drift):
  1. raw iteration rate: tolerance 0 so no lane ever converges; every tile
     runs exactly max_iter iterations -> clean time/lane-iteration at each
     batch tile.  FLOPs/lane-iter = 2*sw*(sw+1) (the fused matmul) + VPU
     elementwise; prints achieved MXU rate.
  2. the real workload (convergence on), single-phase vs two-phase with
     per-group straggler compaction.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_sweep(G, L, dtype):
    import jax.numpy as jnp
    from tinympc_julia_tpu import make_problem, precompute_cache
    from tinympc_julia_tpu.models import quadrotor
    from tinympc_julia_tpu.parallel.grouped import stack_instances
    N = quadrotor.HORIZON
    rng = np.random.default_rng(4)
    probs, caches = [], []
    for g in range(G):
        A = np.asarray(quadrotor.A) + rng.normal(scale=2e-3, size=(12, 12))
        Bm = np.asarray(quadrotor.B) * rng.uniform(0.9, 1.1)
        Qd = np.asarray(quadrotor.Q_DIAG) * rng.uniform(0.8, 1.25, size=12)
        Rd = np.asarray(quadrotor.R_DIAG) * rng.uniform(0.8, 1.25, size=4)
        ub = rng.uniform(0.4, 0.6)
        p = make_problem(jnp.asarray(A, dtype), jnp.asarray(Bm, dtype),
                         jnp.asarray(np.diag(Qd), dtype),
                         jnp.asarray(np.diag(Rd), dtype), quadrotor.RHO, N,
                         u_min=-ub, u_max=ub)
        c = precompute_cache(p.A, p.B, p.Q, p.R,
                             jnp.asarray(quadrotor.RHO, dtype))
        probs.append(p)
        caches.append(c)
    x0s = rng.uniform(-0.25, 0.25, size=(G, L, 12))
    return stack_instances(probs), stack_instances(caches), x0s, N


def main():
    import jax
    import jax.numpy as jnp
    from tinympc_julia_tpu.ops.condensed import build_condensed
    from tinympc_julia_tpu.ops.pallas.condensed_kernel import (
        make_condensed_fused_solver)

    dtype = jnp.float32
    G, L = 64, 1024
    p, c, x0s_np, N = build_sweep(G, L, dtype)
    maps = build_condensed(p, c)
    x0s = jnp.asarray(x0s_np, dtype)
    nx, nu = 12, 4
    sw = N * nx + (N - 1) * nu
    bounds = (p.u_min, p.u_max, p.x_min, p.x_max)
    kw = dict(en_input_bound=True, en_state_bound=False,
              relaxation_alpha=1.7)

    def median(run, reps=8):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    # --- experiment 1: raw iteration rate (tol=0, fixed 100 iters) --------
    ITERS = 100
    print(f"exp1: raw rate, sw={sw}, G={G}, L={L}, {ITERS} iters, tol=0",
          flush=True)
    runs = {}
    for Bt in (256, 512, 1024):
        try:
            fn = make_condensed_fused_solver(
                nx, nu, N, batch_tile=Bt, max_iter=ITERS,
                abs_pri_tol=0.0, abs_dua_tol=0.0, check_termination=4,
                num_groups=G, **kw)

            def run(fn=fn):
                out = fn(maps, c.rho, *bounds, x0s)
                jax.block_until_ready(out[3])
            run()   # compile
            runs[Bt] = run
        except Exception as e:  # VMEM overflow etc.
            print(f"  Bt={Bt}: FAILED {type(e).__name__}: {str(e)[:150]}",
                  flush=True)
    times = {k: [] for k in runs}
    for _ in range(8):
        for Bt, run in runs.items():
            t0 = time.perf_counter()
            run()
            times[Bt].append(time.perf_counter() - t0)
    for Bt, ts in times.items():
        t = float(np.median(ts))
        lane_iters = G * L * ITERS
        mxu_flops = 2.0 * sw * (sw + 1) * lane_iters
        print(f"  Bt={Bt}: {t*1e3:8.2f} ms  {lane_iters/t:.3e} lane-iters/s"
              f"  {mxu_flops/t/1e12:6.2f} TFLOP/s fused-matmul", flush=True)

    # --- experiment 2: workload, single vs two-phase ----------------------
    print("exp2: real workload (tol 1e-3, alpha=1.7, ct=4)", flush=True)
    cfgs = {}

    def single(Bt, mi):
        fn = make_condensed_fused_solver(
            nx, nu, N, batch_tile=Bt, max_iter=mi, check_termination=4,
            num_groups=G, **kw)

        @jax.jit
        def pl_(x0s):
            return fn(maps, c.rho, *bounds, x0s)

        def run():
            out = pl_(x0s)
            jax.block_until_ready(out[3])
            return (np.asarray(out[3]).sum(), np.asarray(out[2]).sum())
        return run

    def twophase(Bt, mi1, L2, mi2, Bt2):
        fn1 = make_condensed_fused_solver(
            nx, nu, N, batch_tile=Bt, max_iter=mi1, check_termination=4,
            carry_out=True, num_groups=G, **kw)
        fn2 = make_condensed_fused_solver(
            nx, nu, N, batch_tile=Bt2, max_iter=mi2, check_termination=4,
            warm_start=True, num_groups=G, **kw)

        @jax.jit
        def pl_(x0s):
            _, _, it1, ok1, carry = fn1(maps, c.rho, *bounds, x0s)
            unconv = (ok1 == 0).reshape(G, L)
            # per-group compaction keeps each straggler aligned with its
            # group's T12 block in phase 2
            idx = jax.vmap(
                lambda m: jnp.nonzero(m, size=L2, fill_value=0)[0])(unconv)
            gidx = (idx + jnp.arange(G)[:, None] * L).reshape(-1)
            warm = tuple(w[:, gidx] for w in carry)
            x0s2 = x0s.reshape(G * L, nx)[gidx].reshape(G, L2, nx)
            _, _, it2, ok2 = fn2(maps, c.rho, *bounds, x0s2, warm)
            return it1, ok1, it2, ok2, unconv

        def run():
            out = pl_(x0s)
            jax.block_until_ready(out[3])
            return out

        def stats():
            it1, ok1, it2, ok2, unconv = run()
            n1 = int(np.asarray(ok1).sum())
            m2 = np.asarray(unconv).sum(1)  # per-group straggler counts
            mask2 = np.zeros((G, L2), bool)
            for g, k in enumerate(m2):
                mask2[g, :min(k, L2)] = True
            ok2 = np.asarray(ok2).reshape(G, L2)
            it2 = np.asarray(it2).reshape(G, L2)
            n2 = int(ok2[mask2].sum())
            iters = float(np.asarray(it1).sum() + it2[mask2].sum())
            return n1 + n2, iters, int(m2.max()), run
        return stats

    for name, mk in {
        "single_bt512_mi300": lambda: single(512, 300),
        "two_bt512_mi100_L2-256": lambda: twophase(512, 100, 256, 300, 256),
        "two_bt512_mi60_L2-256": lambda: twophase(512, 60, 256, 300, 256),
        "two_bt1024_mi100_L2-256": lambda: twophase(1024, 100, 256, 300,
                                                    256),
    }.items():
        try:
            r = mk()
            if name.startswith("single"):
                conv, iters = r()
                cfgs[name] = (r, conv, iters, -1)
            else:
                conv, iters, maxs, run = r()
                cfgs[name] = (run, conv, iters, maxs)
        except Exception as e:
            print(f"  {name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    times = {k: [] for k in cfgs}
    for _ in range(8):
        for name, (run, *_rest) in cfgs.items():
            t0 = time.perf_counter()
            run()
            times[name].append(time.perf_counter() - t0)
    for name, (run, conv, iters, maxs) in cfgs.items():
        t = float(np.median(times[name]))
        print(f"  {name}: {t*1e3:8.1f} ms  {conv}/{G*L} conv "
              f"({100*conv/(G*L):.2f}%)  {conv/t:8.0f} solves/s  "
              f"{iters/t:.3e} useful-iters/s  max_straggler/group={maxs}",
          flush=True)


if __name__ == "__main__":
    main()
