"""Warm-started condensed solves + the condensed MPC loop."""
import numpy as np
import jax.numpy as jnp

from tinympc_julia_tpu import Settings, make_problem, precompute_cache
from tinympc_julia_tpu.models import cartpole, rocket
from tinympc_julia_tpu.ops.condensed import (build_condensed,
                                             ref_backward_const,
                                             solve_condensed)
from tinympc_julia_tpu.parallel import run_mpc_loop
from tinympc_julia_tpu.parallel.mpc import run_mpc_loop_condensed


def _mk():
    p = make_problem(jnp.asarray(cartpole.A), jnp.asarray(cartpole.B),
                     jnp.asarray(np.diag(cartpole.Q_DIAG)),
                     jnp.asarray(np.diag(cartpole.R_DIAG)), 1.0, 20,
                     u_min=-5.0, u_max=5.0)
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(1.0, p.A.dtype))
    s = Settings(max_iter=100, en_state_bound=False, en_input_bound=True)
    return p, c, s


def test_warm_start_reduces_iterations():
    p, c, s = _mk()
    maps = build_condensed(p, c)
    x0s = jnp.asarray([[0.5, 0.0, 0.1, 0.0]])
    _, _, it_cold, ok, carry = solve_condensed(p, c, s, x0s, maps,
                                               return_carry=True)
    # re-solve a nearby problem warm-started
    x0s2 = x0s + 0.01
    _, _, it_warm, ok2, _ = solve_condensed(p, c, s, x0s2, maps, warm=carry,
                                            return_carry=True)
    assert int(ok[0]) == 1 and int(ok2[0]) == 1
    assert int(it_warm[0]) < int(it_cold[0])


def test_ref_backward_const_matches_baked_maps():
    """Maps baked with refs == ref-free maps + d_ref correction."""
    rng = np.random.default_rng(0)
    Xref = jnp.asarray(rng.normal(size=(20, 4)) * 0.1)
    Uref = jnp.asarray(rng.normal(size=(19, 1)) * 0.05)
    p, c, s = _mk()
    p_ref = p.replace(Xref=Xref, Uref=Uref)
    maps_baked = build_condensed(p_ref, c)
    maps_free = build_condensed(p, c)
    d_ref = ref_backward_const(p_ref, c)
    # T2 const column difference must equal d_ref
    np.testing.assert_allclose(
        np.asarray(maps_baked.T2[:, -1] - maps_free.T2[:, -1]),
        np.asarray(d_ref), atol=1e-12)


def test_condensed_loop_matches_standard_loop():
    p, c, s = _mk()
    x0s = jnp.asarray([[0.0, 0.0, 0.1, 0.0], [0.4, -0.1, -0.05, 0.0]])
    n_steps = 20
    res_std = run_mpc_loop(p, c, s, x0s, n_steps)
    res_cond = run_mpc_loop_condensed(p, c, s, x0s, n_steps)
    np.testing.assert_array_equal(np.asarray(res_cond.iters),
                                  np.asarray(res_std.iters))
    np.testing.assert_allclose(np.asarray(res_cond.us),
                               np.asarray(res_std.us), atol=1e-10)
    np.testing.assert_allclose(np.asarray(res_cond.xs),
                               np.asarray(res_std.xs), atol=1e-10)


def test_condensed_loop_with_moving_refs():
    p = make_problem(jnp.asarray(rocket.A), jnp.asarray(rocket.B),
                     jnp.asarray(np.diag(rocket.Q_DIAG)),
                     jnp.asarray(np.diag(rocket.R_DIAG)), 1.0, 10,
                     f=jnp.asarray(rocket.F), u_min=-10.0, u_max=105.0)
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(1.0, p.A.dtype))
    s = Settings(max_iter=100, abs_pri_tol=2e-3, en_state_bound=False,
                 en_input_bound=True)
    n_steps = 15
    Xrefs = np.stack([rocket.reference_trajectory(k)[0].T
                      for k in range(n_steps)])
    Urefs = np.stack([rocket.reference_trajectory(k)[1].T
                      for k in range(n_steps)])
    x0s = jnp.asarray([rocket.X_INIT])
    res_std = run_mpc_loop(p, c, s, x0s, n_steps, Xrefs=Xrefs, Urefs=Urefs)
    res_cond = run_mpc_loop_condensed(p, c, s, x0s, n_steps, Xrefs=Xrefs,
                                      Urefs=Urefs)
    np.testing.assert_array_equal(np.asarray(res_cond.iters),
                                  np.asarray(res_std.iters))
    np.testing.assert_allclose(np.asarray(res_cond.us),
                               np.asarray(res_std.us), atol=1e-9)


def test_fused_loop_matches_condensed_loop():
    """The all-Pallas closed loop (run_mpc_loop_fused) tracks the XLA
    condensed loop in float32: same per-step iteration counts, matching
    applied controls."""
    import jax.numpy as jnp
    from tinympc_julia_tpu.parallel.mpc import run_mpc_loop_fused

    dtype = jnp.float32
    p = make_problem(jnp.asarray(cartpole.A, dtype),
                     jnp.asarray(cartpole.B, dtype),
                     jnp.asarray(np.diag(cartpole.Q_DIAG), dtype),
                     jnp.asarray(np.diag(cartpole.R_DIAG), dtype), 1.0, 20,
                     u_min=-5.0, u_max=5.0)
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(1.0, dtype))
    rng = np.random.default_rng(5)
    x0s = jnp.asarray(rng.uniform(-0.4, 0.4, size=(16, 4)), dtype)
    n_steps = 20
    # alpha=1.7 makes the carry semantics observable: a lane that converged
    # at step k feeds u_hat = a*u + (1-a)*z at step k+1, so the carry z must
    # be the pre-convergence iterate (CondensedCarry), not the latched
    # solution
    for alpha in (1.0, 1.7):
        s = Settings(max_iter=200, en_state_bound=False, en_input_bound=True,
                     relaxation_alpha=alpha)
        res_f = run_mpc_loop_fused(p, c, s, x0s, n_steps, batch_tile=16)
        res_c = run_mpc_loop_condensed(p, c, s, x0s, n_steps)
        assert np.asarray(res_f.solved).all() and np.asarray(res_c.solved).all()
        np.testing.assert_array_equal(np.asarray(res_f.iters),
                                      np.asarray(res_c.iters))
        np.testing.assert_allclose(np.asarray(res_f.us), np.asarray(res_c.us),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(res_f.xs), np.asarray(res_c.xs),
                                   atol=1e-5)
