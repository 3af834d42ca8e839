#!/usr/bin/env python3
"""Interleaved A/B of fused-kernel configs (round-robin reps to cancel the
tunneled chip's drift).  Each config's two-phase pipeline is ONE jitted
dispatch (eager inter-op round trips dominate otherwise).  Diagnostics only."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from tinympc_julia_tpu import make_problem, precompute_cache
    from tinympc_julia_tpu.models import cartpole
    from tinympc_julia_tpu.ops.condensed import build_condensed
    from tinympc_julia_tpu.ops.pallas.condensed_kernel import (
        make_condensed_fused_solver)

    dtype = jnp.float32
    N = cartpole.HORIZON
    B = 65536
    B2 = 8192
    ALPHA = 1.7
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
    kw = dict(en_input_bound=True, en_state_bound=False,
              relaxation_alpha=ALPHA)

    def make_cfg(bt1, ct):
        m1 = 100 if 100 % ct == 0 else (100 // ct + 1) * ct
        m2 = 300 if 300 % ct == 0 else (300 // ct + 1) * ct
        fn1 = make_condensed_fused_solver(4, 1, N, batch_tile=bt1,
                                          max_iter=m1, carry_out=True,
                                          check_termination=ct, **kw)
        fn2 = make_condensed_fused_solver(4, 1, N, batch_tile=1024,
                                          max_iter=m2, warm_start=True,
                                          check_termination=ct, **kw)

        @jax.jit
        def pipeline(x0s):
            _, _, it1, ok1, carry = fn1(maps, c.rho, *bounds, x0s)
            idx = jnp.nonzero(ok1 == 0, size=B2, fill_value=0)[0]
            warm = tuple(w[:, idx] for w in carry)
            _, _, it2, ok2 = fn2(maps, c.rho, *bounds, x0s[idx], warm)
            return ok1, ok2

        def run():
            out = pipeline(x0s)
            jax.block_until_ready(out[1])
            return out
        return run

    cfgs = {
        "bt2048_ct1": make_cfg(2048, 1),
        "bt2048_ct2": make_cfg(2048, 2),
        "bt2048_ct4": make_cfg(2048, 4),
        "bt1024_ct2": make_cfg(1024, 2),
        "bt4096_ct2": make_cfg(4096, 2),
    }
    conv = {}
    for name, run in cfgs.items():  # compile + convergence check
        ok1, ok2 = run()
        conv[name] = int(np.asarray(ok1).sum() + np.asarray(ok2).sum())
    times = {k: [] for k in cfgs}
    for rep in range(12):
        for name, run in cfgs.items():
            t0 = time.perf_counter()
            run()
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        med = float(np.median(ts))
        print(f"{name}: {med * 1e3:7.2f} ms median, "
              f"{B / med:10.0f} solves/s, conv~{conv[name]}  "
              f"(min {min(ts)*1e3:.2f})", flush=True)


if __name__ == "__main__":
    main()
