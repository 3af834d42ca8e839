#!/usr/bin/env python3
"""Adaptive-rho that actually adapts: recovering from a mis-set rho0.

The constrained cart-pole (analog of
/root/reference/examples/cartpole_example_reference_constrained.jl) with
the penalty parameter deliberately mis-set 100x low.  Fixed-rho0 grinds or
fails; the reference's OSQP-form adaptive controller only ever DECAYS rho
(measured — docs/DESIGN.md §4) and makes it worse; the framework's opt-in
extension pair — termination-residual controller + exact on-device Riccati
rebuild — raises rho to a working value and converges in a handful of
iterations.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from tinympc_julia_tpu import Settings, init_state, make_problem, precompute_cache
from tinympc_julia_tpu.models import cartpole
from tinympc_julia_tpu.parallel import broadcast_state, set_x0_batch
from tinympc_julia_tpu.parallel.batch import solve_batch


def main(B=64, rho0=0.01):
    dtype = jnp.float32
    N = cartpole.HORIZON
    xmax = np.array([2.0, 1e17, 1e17, 1e17])
    p = make_problem(jnp.asarray(cartpole.A, dtype),
                     jnp.asarray(cartpole.B, dtype),
                     jnp.asarray(np.diag(cartpole.Q_DIAG), dtype),
                     jnp.asarray(np.diag(cartpole.R_DIAG), dtype),
                     rho0, N, u_min=-5.0, u_max=5.0,
                     x_min=jnp.asarray(np.tile(-xmax, (N, 1)), dtype),
                     x_max=jnp.asarray(np.tile(xmax, (N, 1)), dtype))
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(rho0, dtype))
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-1, 1, size=(B, 4))
                      * np.array([1.8, 1.0, 0.4, 0.5]), dtype)
    st = set_x0_batch(broadcast_state(init_state(4, 1, N, dtype), B), x0s)
    base = dict(max_iter=500, en_state_bound=True, en_input_bound=True)

    _, _, fixed = solve_batch(p, c, Settings(**base), st)
    _, ca, adapt = solve_batch(
        p, c, Settings(adaptive_rho=True, adaptive_rho_rebuild=True,
                       adaptive_rho_controller="termination",
                       adaptive_rho_min=1e-4, adaptive_rho_max=1e4, **base),
        st)

    rho = np.asarray(ca.rho)
    print(f"rho0 = {rho0} (mis-set ~100x low), B = {B} constrained-cartpole "
          f"solves:")
    print(f"  fixed rho0:        {int(np.sum(np.asarray(fixed.solved)))}/{B}"
          f" converged, mean {float(np.mean(np.asarray(fixed.iter))):.0f} "
          f"iterations")
    print(f"  adaptive (rebuild): {int(np.sum(np.asarray(adapt.solved)))}/"
          f"{B} converged, mean "
          f"{float(np.mean(np.asarray(adapt.iter))):.0f} iterations, "
          f"final rho span [{rho.min():.3g}, {rho.max():.3g}]")

    # The throughput-viable form: the bucketed exact-rebuild pipeline on
    # the fused fast path (~3000x the nested rebuild's solve rate on chip;
    # parallel/rebuild.py, docs/DESIGN.md §4) through the user API.
    from tinympc_julia_tpu import TinyMPCSolver
    solver = TinyMPCSolver(dtype=dtype)
    solver.setup(np.asarray(cartpole.A), np.asarray(cartpole.B), None,
                 np.diag(cartpole.Q_DIAG), np.diag(cartpole.R_DIAG),
                 rho0, 4, 1, N, max_iter=500,
                 adaptive_rho_min=1e-4, adaptive_rho_max=1e4)
    solver.set_bound_constraints(
        np.tile(-xmax[:, None], (1, N)), np.tile(xmax[:, None], (1, N)),
        np.full((1, N - 1), -5.0), np.full((1, N - 1), 5.0))
    xs, us, iters, solved, rho_b = solver.solve_batch_rebuild_adaptive(
        np.asarray(x0s), phase1_iters=50, phase2_iters=450)
    print(f"  bucketed rebuild:  {int(solved.sum())}/{B} converged, mean "
          f"{float(iters.mean()):.0f} iterations, rho span "
          f"[{rho_b.min():.3g}, {rho_b.max():.3g}] (fused fast path)")


if __name__ == "__main__":
    main()
