#!/usr/bin/env python3
"""Horizon-scaling study: sequential scans vs log-depth associative scans vs
chunked condensation vs the full condensed formulation as N grows
(SURVEY.md §7 step 4's crossover benchmark; VERDICT r3 item 4's long-horizon
extension).  Fixed iteration count (check_termination=0) so all paths do the
same work per lane.  Timing materializes a small output per rep (the remote
tunnel's block_until_ready can return early — see bench._median_time).
Diagnostics only."""
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
    from tinympc_julia_tpu import (Settings, init_state, make_problem,
                                   precompute_cache)
    from tinympc_julia_tpu.models import cartpole
    from tinympc_julia_tpu.ops.condensed import (auto_chunk_size,
                                                 auto_uses_condensed,
                                                 build_condensed,
                                                 solve_condensed)
    from tinympc_julia_tpu.ops.scans import build_chunk_maps
    from tinympc_julia_tpu.parallel import broadcast_state, set_x0_batch
    from tinympc_julia_tpu.parallel.batch import solve_batch

    dtype = jnp.float32
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    ITERS = 20
    REPS = 5
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, size=(B, 4)), dtype)

    def timeit(fn, sync):
        np.asarray(sync(fn()))  # compile + drain
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(sync(out))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    print(f"B={B}, {ITERS} ADMM iterations, cartpole plant, times in ms "
          f"(lane-iters/s)", flush=True)
    Ns = [int(a) for a in sys.argv[2:]] or [64, 256, 1024, 2049, 4097, 8193]
    for N in Ns:
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
        t0 = time.time()
        t = timeit(lambda: solve_batch(p, c, s, st0),
                   lambda o: o[2].iter[:4])
        row.append(f"seq {t * 1e3:9.2f} ({B * ITERS / t:.2e})")

        C = auto_chunk_size(4, 1, N)
        if C is not None:
            cm = build_chunk_maps(p, c, C)
            t = timeit(lambda: solve_batch(p, c, s, st0, chunk_maps=cm),
                       lambda o: o[2].iter[:4])
            row.append(f"chunked(C={C}) {t * 1e3:9.2f} "
                       f"({B * ITERS / t:.2e})")
        else:
            row.append("chunked: no divisor")

        if auto_uses_condensed(4, 1, N):
            maps = build_condensed(p, c)
            t = timeit(lambda: solve_condensed(p, c, s, x0s, maps),
                       lambda o: o[2][:4])
            row.append(f"condensed {t * 1e3:9.2f} ({B * ITERS / t:.2e})")
        else:
            row.append("condensed: over budget")
        print("  ".join(row) + f"   [{time.time() - t0:.0f}s incl compile]",
              flush=True)


if __name__ == "__main__":
    main()
