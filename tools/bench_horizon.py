#!/usr/bin/env python3
"""Horizon-scaling study: sequential scans vs log-depth associative scans vs
the condensed formulation as N grows (SURVEY.md §7 step 4's crossover
benchmark).  Fixed iteration count (check_termination=0) so all paths do the
same work per lane.  Diagnostics only."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from tinympc_julia_tpu import (Settings, init_state, make_problem,
                                   precompute_cache)
    from tinympc_julia_tpu.models import cartpole
    from tinympc_julia_tpu.ops.condensed import build_condensed, solve_condensed
    from tinympc_julia_tpu.parallel import broadcast_state, set_x0_batch
    from tinympc_julia_tpu.parallel.batch import solve_batch

    dtype = jnp.float32
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    ITERS = 20
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, size=(B, 4)), dtype)

    print(f"B={B}, {ITERS} ADMM iterations, cartpole plant, times in ms "
          f"(lane-iters/s)", flush=True)
    for N in (16, 64, 256, 1024):
        p = make_problem(jnp.asarray(cartpole.A, dtype),
                         jnp.asarray(cartpole.B, dtype),
                         jnp.asarray(np.diag(cartpole.Q_DIAG), dtype),
                         jnp.asarray(np.diag(cartpole.R_DIAG), dtype),
                         1.0, N, u_min=-5.0, u_max=5.0)
        c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(1.0, dtype))
        s = Settings(max_iter=ITERS, check_termination=0,
                     en_state_bound=False, en_input_bound=True)
        st0 = set_x0_batch(
            broadcast_state(init_state(4, 1, N, dtype), B), x0s)

        row = [f"N={N:5d}:"]
        for name, kw in (("seq-scan", dict(horizon_parallel=False)),
                         ("assoc-scan", dict(horizon_parallel=True))):
            fn = lambda: solve_batch(p, c, s, st0, **kw)
            jax.block_until_ready(fn()[2].iter)
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                jax.block_until_ready(fn()[2].iter)
                ts.append(time.perf_counter() - t0)
            t = float(np.median(ts))
            row.append(f"{name} {t * 1e3:9.2f} ({B * ITERS / t:.2e})")

        if N <= 256:  # condensed maps are O((N nx)^2); skip huge N
            maps = build_condensed(p, c)
            fn = lambda: solve_condensed(p, c, s, x0s, maps)
            jax.block_until_ready(fn()[2])
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                jax.block_until_ready(fn()[2])
                ts.append(time.perf_counter() - t0)
            t = float(np.median(ts))
            row.append(f"condensed {t * 1e3:9.2f} ({B * ITERS / t:.2e})")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
