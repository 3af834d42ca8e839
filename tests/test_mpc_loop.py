"""On-device batched closed-loop MPC vs the host-driven API loop."""
import numpy as np
import jax.numpy as jnp

from tinympc_julia_tpu import Settings, make_problem, precompute_cache
from tinympc_julia_tpu.models import cartpole, rocket
from tinympc_julia_tpu.parallel import run_mpc_loop


def test_matches_host_loop():
    """The fully on-device loop must reproduce the host-driven warm-started
    loop exactly (same controls, same per-step iteration counts)."""
    p = make_problem(jnp.asarray(cartpole.A), jnp.asarray(cartpole.B),
                     jnp.asarray(np.diag(cartpole.Q_DIAG)),
                     jnp.asarray(np.diag(cartpole.R_DIAG)), 1.0, 20,
                     u_min=-5.0, u_max=5.0)
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(1.0, p.A.dtype))
    s = Settings(max_iter=100, en_state_bound=False, en_input_bound=True)
    x0s = jnp.asarray([[0.0, 0.0, 0.1, 0.0], [0.5, 0.0, -0.05, 0.0]])
    n_steps = 25

    res = run_mpc_loop(p, c, s, x0s, n_steps)
    assert res.us.shape == (2, n_steps, 1)
    assert res.xs.shape == (2, n_steps, 4)

    # host-driven loop per instance via the stateful API
    for b in range(2):
        solver = cartpole.make_solver(max_iter=100)
        solver.set_bound_constraints(
            np.full((4, 20), -1e17), np.full((4, 20), 1e17),
            np.full((1, 19), -5.0), np.full((1, 19), 5.0))
        solver.update_settings(en_state_bound=False)
        x = np.asarray(x0s[b])
        for t in range(n_steps):
            solver.set_x0(x)
            solver.solve()
            u = solver.get_solution().controls[:, 0]
            np.testing.assert_allclose(np.asarray(res.us[b, t]), u, atol=1e-10,
                                       err_msg=f"instance {b} step {t}")
            assert int(res.iters[b, t]) == int(solver.solution.iter)
            x = cartpole.simulate(x, u)


def test_reference_schedule():
    """Per-step moving references (the rocket pattern) flow through."""
    p = make_problem(jnp.asarray(rocket.A), jnp.asarray(rocket.B),
                     jnp.asarray(np.diag(rocket.Q_DIAG)),
                     jnp.asarray(np.diag(rocket.R_DIAG)), 1.0, 10,
                     f=jnp.asarray(rocket.F),
                     u_min=-10.0, u_max=105.0)
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(1.0, p.A.dtype))
    s = Settings(max_iter=100, abs_pri_tol=2e-3, en_state_bound=False,
                 en_input_bound=True)
    n_steps = 20
    Xrefs = np.stack([rocket.reference_trajectory(k)[0].T
                      for k in range(n_steps)])
    Urefs = np.stack([rocket.reference_trajectory(k)[1].T
                      for k in range(n_steps)])
    x0s = jnp.asarray([rocket.X_INIT, rocket.X_INIT * 1.05])
    res = run_mpc_loop(p, c, s, x0s, n_steps, Xrefs=Xrefs, Urefs=Urefs)
    # thrust stays in box, altitude positive during the early feasible phase
    assert np.all(np.asarray(res.us) >= -10.0 - 1e-6)
    assert np.all(np.asarray(res.us) <= 105.0 + 1e-6)
    assert np.all(np.asarray(res.xs)[:, :, 2] > 0)


def test_adaptive_rho_loop():
    p = make_problem(jnp.asarray(cartpole.A), jnp.asarray(cartpole.B),
                     jnp.asarray(np.diag(cartpole.Q_DIAG)),
                     jnp.asarray(np.diag(cartpole.R_DIAG)), 1.0, 20,
                     u_min=-1.0, u_max=1.0)
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(1.0, p.A.dtype))
    s = Settings(max_iter=100, en_state_bound=False, en_input_bound=True,
                 adaptive_rho=True, adaptive_rho_min=0.5, adaptive_rho_max=5.0)
    x0s = jnp.asarray([[1.0, 0.0, 0.2, 0.0], [-0.5, 0.3, 0.0, 0.0]])
    res = run_mpc_loop(p, c, s, x0s, 10)
    rhos = np.asarray(res.cache.rho)
    assert rhos.shape == (2,)
    assert np.all((rhos >= 0.5) & (rhos <= 5.0))
