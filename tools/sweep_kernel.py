#!/usr/bin/env python3
"""Perf sweep for the fused condensed kernel: batch_tile x matmul precision.

Runs the bench.py workload (65536 cartpole instances, alpha=1.7, two-phase)
for each config and reports solves/s + convergence.  Diagnostics only; not a
test.  Run on the real TPU chip.
"""
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
    from tinympc_julia_tpu.ops.pallas import condensed_kernel as ck

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

    for prec_name in sys.argv[1].split(",") if len(sys.argv) > 1 else \
            ["HIGHEST", "HIGH", "DEFAULT"]:
        prec = getattr(jax.lax.Precision, prec_name)
        for Bt in (1024, 2048, 4096):
            fn1 = ck.make_condensed_fused_solver(4, 1, N, batch_tile=Bt,
                                                 max_iter=100, precision=prec,
                                                 **kw)
            fn2 = ck.make_condensed_fused_solver(4, 1, N, batch_tile=1024,
                                                 max_iter=400, precision=prec,
                                                 **kw)

            def run():
                _, _, it1, ok1 = fn1(maps, c.rho, *bounds, x0s)
                unconv = ok1 == 0
                idx = jnp.nonzero(unconv, size=B2, fill_value=0)[0]
                _, _, it2, ok2 = fn2(maps, c.rho, *bounds, x0s[idx])
                jax.block_until_ready(ok2)
                return it1, ok1, idx, it2, ok2, unconv

            it1, ok1, idx, it2, ok2, unconv = run()
            n1 = int(np.sum(np.asarray(ok1)))
            n_straggler = int(np.sum(np.asarray(unconv)))
            mask2 = np.zeros(B2, bool)
            mask2[:n_straggler] = True
            n2 = int(np.sum(np.asarray(ok2)[mask2]))
            n_conv = n1 + n2

            times = []
            for _ in range(10):
                t0 = time.perf_counter()
                run()
                times.append(time.perf_counter() - t0)
            t = float(np.median(times))
            print(f"prec={prec_name:8s} Bt={Bt:5d}: {n_conv}/{B} conv "
                  f"({100.0 * n_conv / B:.2f}%), {t * 1e3:7.2f} ms, "
                  f"{n_conv / t:10.0f} solves/s", flush=True)


if __name__ == "__main__":
    main()
