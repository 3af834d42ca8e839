#!/usr/bin/env python3
"""Benchmark: converged cartpole-class MPC solves/sec on one chip.

North star (BASELINE.json): >= 1e5 converged cartpole MPC solves/sec on a
v5e-16 slice == 6250 solves/sec/chip.  vs_baseline is measured against that
per-chip share (the reference itself publishes no numbers, BASELINE.md).

Prints ONE JSON line to stdout; diagnostics go to stderr.
"""
import json
import sys
import time

import numpy as np

PER_CHIP_TARGET = 1e5 / 16  # north-star v5e-16 share


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from tinympc_julia_tpu import (Settings, init_state, make_problem,
                                   precompute_cache)
    from tinympc_julia_tpu.models import cartpole
    from tinympc_julia_tpu.parallel import broadcast_state, set_x0_batch
    from tinympc_julia_tpu.parallel.batch import solve_batch

    dtype = jnp.float32
    N = cartpole.HORIZON
    B = 4096

    p = make_problem(jnp.asarray(cartpole.A, dtype),
                     jnp.asarray(cartpole.B, dtype),
                     jnp.asarray(np.diag(cartpole.Q_DIAG), dtype),
                     jnp.asarray(np.diag(cartpole.R_DIAG), dtype),
                     cartpole.RHO, N, u_min=-5.0, u_max=5.0)
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(cartpole.RHO, dtype))
    s = Settings(max_iter=500, en_state_bound=False, en_input_bound=True)

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, size=(B, 4)), dtype)
    st0 = set_x0_batch(broadcast_state(init_state(4, 1, N, dtype), B), x0s)

    # Warmup / compile
    stb, _, sol = solve_batch(p, c, s, st0)
    jax.block_until_ready(sol.u)
    n_conv = int(np.sum(np.asarray(sol.solved)))
    iters = np.asarray(sol.iter)
    log(f"bench: backend={jax.default_backend()} batch={B} "
        f"converged={n_conv}/{B} mean_iters={iters.mean():.1f}")

    reps = 20
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _, _, sol = solve_batch(p, c, s, st0)
        jax.block_until_ready(sol.u)
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))
    solves_per_sec = n_conv / t
    total_iters = float(iters.sum())
    log(f"bench: median batch time {t * 1e3:.2f} ms over {reps} reps; "
        f"{solves_per_sec:.0f} converged solves/s; "
        f"{total_iters / t:.2e} ADMM iters/s")

    print(json.dumps({
        "metric": "converged_cartpole_mpc_solves_per_sec_per_chip",
        "value": round(solves_per_sec, 1),
        "unit": "solves/s/chip",
        "vs_baseline": round(solves_per_sec / PER_CHIP_TARGET, 3),
    }))


if __name__ == "__main__":
    main()
