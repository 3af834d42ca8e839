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
    from tinympc_julia_tpu import Settings, make_problem, precompute_cache
    from tinympc_julia_tpu.models import cartpole
    from tinympc_julia_tpu.ops.condensed import build_condensed

    from tinympc_julia_tpu.ops.pallas.condensed_kernel import (
        make_condensed_fused_solver)

    dtype = jnp.float32
    N = cartpole.HORIZON
    B = 65536          # instances per measured batch
    B2 = 8192          # phase-2 straggler batch (compacted)
    ALPHA = 1.7        # over-relaxation

    p = make_problem(jnp.asarray(cartpole.A, dtype),
                     jnp.asarray(cartpole.B, dtype),
                     jnp.asarray(np.diag(cartpole.Q_DIAG), dtype),
                     jnp.asarray(np.diag(cartpole.R_DIAG), dtype),
                     cartpole.RHO, N, u_min=-5.0, u_max=5.0)
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(cartpole.RHO, dtype))
    maps = build_condensed(p, c)
    kw = dict(en_input_bound=True, en_state_bound=False,
              relaxation_alpha=ALPHA, check_termination=4)
    fn1 = make_condensed_fused_solver(4, 1, N, batch_tile=2048, max_iter=100,
                                      carry_out=True, **kw)
    fn2 = make_condensed_fused_solver(4, 1, N, batch_tile=1024, max_iter=300,
                                      warm_start=True, **kw)

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, size=(B, 4)), dtype)
    bounds = (p.u_min, p.u_max, p.x_min, p.x_max)

    @jax.jit
    def _pipeline(x0s):
        """Two-phase fused solve as ONE dispatch: bulk pass, compact the
        stragglers, CONTINUE them warm from their phase-1 carry (exact
        continuation — no re-solving; VMEM-resident condensed kernel,
        ops/pallas)."""
        _, _, it1, ok1, carry = fn1(maps, c.rho, *bounds, x0s)
        unconv = ok1 == 0
        idx = jnp.nonzero(unconv, size=B2, fill_value=0)[0]
        warm = tuple(w[:, idx] for w in carry)
        _, _, it2, ok2 = fn2(maps, c.rho, *bounds, x0s[idx], warm)
        return it1, ok1, idx, it2, ok2, unconv

    def run():
        out = _pipeline(x0s)
        jax.block_until_ready(out[4])
        return out

    # Warmup / compile both phases
    it1, ok1, idx, it2, ok2, unconv = run()
    n1 = int(np.sum(np.asarray(ok1)))
    n_straggler = int(np.sum(np.asarray(unconv)))
    mask2 = np.zeros(B2, bool)
    mask2[:n_straggler] = True  # nonzero() packs real indices first
    n2 = int(np.sum(np.asarray(ok2)[mask2]))
    n_conv = n1 + n2
    total_iters = float(np.sum(np.asarray(it1))
                        + np.sum(np.asarray(it2)[mask2]))
    log(f"bench: backend={jax.default_backend()} batch={B} alpha={ALPHA} "
        f"phase1 converged={n1}/{B}, stragglers={n_straggler}, "
        f"phase2 converged={n2} -> total {n_conv}/{B} "
        f"({100.0 * n_conv / B:.2f}%)")

    reps = 20
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))
    solves_per_sec = n_conv / t
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
