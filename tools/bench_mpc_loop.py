#!/usr/bin/env python3
"""Closed-loop MPC throughput: XLA condensed loop vs all-Pallas fused loop.
Diagnostics only (the headline bench is bench.py)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from tinympc_julia_tpu import Settings, make_problem, precompute_cache
    from tinympc_julia_tpu.models import cartpole
    from tinympc_julia_tpu.parallel.mpc import (make_fused_mpc_loop,
                                                run_mpc_loop_condensed)

    dtype = jnp.float32
    N = cartpole.HORIZON
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    p = make_problem(jnp.asarray(cartpole.A, dtype),
                     jnp.asarray(cartpole.B, dtype),
                     jnp.asarray(np.diag(cartpole.Q_DIAG), dtype),
                     jnp.asarray(np.diag(cartpole.R_DIAG), dtype),
                     cartpole.RHO, N, u_min=-5.0, u_max=5.0)
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(cartpole.RHO, dtype))
    s = Settings(max_iter=100, en_state_bound=False, en_input_bound=True,
                 relaxation_alpha=1.7)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, size=(B, 4)), dtype)

    fused = make_fused_mpc_loop(p, c, s, n_steps)

    def run_cond(p_, c_, s_, x0s_, n_):
        return run_mpc_loop_condensed(p_, c_, s_, x0s_, n_)

    def run_fused(p_, c_, s_, x0s_, n_):
        return fused(x0s_)

    for name, fn in (("xla_condensed", run_cond),
                     ("pallas_fused ", run_fused)):
        res = fn(p, c, s, x0s, n_steps)  # compile + correctness
        conv = float(np.asarray(res.solved).mean())
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            res = fn(p, c, s, x0s, n_steps)
            jax.block_until_ready(res.us)
            times.append(time.perf_counter() - t0)
        t = float(np.median(times))
        steps = B * n_steps
        print(f"{name}: {t*1e3:8.1f} ms for {steps} closed-loop steps "
              f"-> {steps / t:10.0f} steps/s  ({100*conv:.1f}% solved)",
              flush=True)


if __name__ == "__main__":
    main()
