#!/usr/bin/env python3
"""Phase-1 budget sweep for the headline cartpole two-phase pipeline
(VERDICT r3 item 2 tail) with amortized tunnel-latency-free timing
(bench._median_time rationale).  Interleaved reps.  Diagnostics only."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from tinympc_julia_tpu import make_problem, precompute_cache
    from tinympc_julia_tpu.models import cartpole
    from tinympc_julia_tpu.ops.condensed import build_condensed
    from tinympc_julia_tpu.ops.pallas.condensed_kernel import (
        make_condensed_fused_solver)

    dtype = jnp.float32
    N = cartpole.HORIZON
    B, B2 = 65536, 8192
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
              relaxation_alpha=1.7, check_termination=4)

    def make_cfg(p1, p2):
        fn1 = make_condensed_fused_solver(4, 1, N, batch_tile=2048,
                                          max_iter=p1, carry_out=True, **kw)
        fn2 = make_condensed_fused_solver(4, 1, N, batch_tile=1024,
                                          max_iter=p2, warm_start=True, **kw)

        @jax.jit
        def pipeline(x0s):
            _, _, it1, ok1, carry = fn1(maps, c.rho, *bounds, x0s)
            idx = jnp.nonzero(ok1 == 0, size=B2, fill_value=0)[0]
            warm = tuple(w[:, idx] for w in carry)
            _, _, it2, ok2 = fn2(maps, c.rho, *bounds, x0s[idx], warm)
            return ok1, ok2

        return pipeline

    cfgs = {f"p1={p1}": make_cfg(p1, p2)
            for p1, p2 in ((48, 352), (76, 324), (100, 300), (152, 248),
                           (200, 200))}
    conv = {}
    for name, fn in cfgs.items():
        ok1, ok2 = fn(x0s)
        n1 = int(np.asarray(ok1).sum())
        # count phase-2 only in real slots
        nstr = B - n1
        ok2 = np.asarray(ok2)
        conv[name] = n1 + int(ok2[:min(nstr, B2)].sum())

    def timed(fn, n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(x0s)
        np.asarray(out[1][:8])
        return (time.perf_counter() - t0) / n

    times = {k: [] for k in cfgs}
    for name, fn in cfgs.items():
        timed(fn, 1)  # drain
    for rep in range(8):
        for name, fn in cfgs.items():
            times[name].append(timed(fn, 8))
    for name in cfgs:
        med = float(np.median(times[name]))
        print(f"{name:8s}: {med * 1e3:7.2f} ms/call, "
              f"{conv[name] / med:10.0f} converged solves/s "
              f"({100.0 * conv[name] / B:.2f}% conv)", flush=True)


if __name__ == "__main__":
    main()
