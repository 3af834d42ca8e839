#!/usr/bin/env python3
"""TPU-native flagship: a 64k-instance randomized quadrotor scenario sweep,
batch-sharded across every available device with a pod-wide convergence vote
(BASELINE.json config 5 — no reference analog; the reference is single-
threaded)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tinympc_julia_tpu import (Settings, init_state, make_problem,
                               precompute_cache)
from tinympc_julia_tpu.models import quadrotor
from tinympc_julia_tpu.parallel import (broadcast_state, make_mesh,
                                        set_x0_batch, shard_state,
                                        solve_sharded)
from tinympc_julia_tpu.utils.profiling import solve_stats


def main(B=65536):
    dtype = jnp.float32
    mesh = make_mesh()
    n_dev = mesh.shape["batch"]
    B = (B // n_dev) * n_dev
    print(f"devices: {n_dev}, batch: {B}")

    p = make_problem(jnp.asarray(quadrotor.A, dtype),
                     jnp.asarray(quadrotor.B, dtype),
                     jnp.asarray(np.diag(quadrotor.Q_DIAG), dtype),
                     jnp.asarray(np.diag(quadrotor.R_DIAG), dtype),
                     quadrotor.RHO, quadrotor.HORIZON,
                     u_min=-0.5, u_max=0.5)
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(quadrotor.RHO, dtype))
    s = Settings(max_iter=500, en_state_bound=False, en_input_bound=True)

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, size=(B, 12)), dtype)
    st = set_x0_batch(
        broadcast_state(init_state(12, 4, quadrotor.HORIZON, dtype), B), x0s)
    st = shard_state(st, mesh)

    # compile
    _, _, sol = solve_sharded(p, c, s, st, mesh, vote=True)
    jax.block_until_ready(sol.u)

    t0 = time.perf_counter()
    _, _, sol = solve_sharded(p, c, s, st, mesh, vote=True)
    jax.block_until_ready(sol.u)
    dt = time.perf_counter() - t0

    stats = solve_stats(sol)
    print(f"solved {stats['converged']}/{B} in {dt:.3f}s "
          f"({stats['converged'] / dt:.0f} converged solves/s)")
    print(f"iterations: mean {stats['iter_mean']:.1f} "
          f"p99 {stats['iter_p99']:.0f} max {stats['iter_max']}")


if __name__ == "__main__":
    main()
