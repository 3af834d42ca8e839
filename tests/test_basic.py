"""Behavioral contracts mirroring the reference test suite
(/root/reference/tests/test_basic.jl): setup status, solution shapes, and
bound-constraint satisfaction."""
import numpy as np

from tinympc_julia_tpu.models import cartpole


def test_setup_status():
    # test_basic.jl:18-22
    s = cartpole.make_solver()
    assert s.is_setup


def test_solve_and_solution_shapes():
    # test_basic.jl:24-45
    s = cartpole.make_solver()
    s.set_x0([0.5, 0.0, 0.0, 0.0])
    status = s.solve()
    assert status in (0, 1)
    sol = s.get_solution()
    assert sol.states.shape == (4, 20)
    assert sol.controls.shape == (1, 19)
    assert np.all(np.isfinite(sol.states))
    assert np.all(np.isfinite(sol.controls))


def test_bound_constraints_respected():
    # test_basic.jl:47-70: from a large disturbance, all |u| <= bound.
    s = cartpole.make_solver(max_iter=200)
    N = 20
    s.set_bound_constraints(np.full((4, N), -1e17), np.full((4, N), 1e17),
                            np.full((1, N - 1), -1.0), np.full((1, N - 1), 1.0))
    s.set_x0([3.0, 0.5, 0.3, -0.2])
    s.solve()
    sol = s.get_solution()
    assert np.all(np.abs(sol.controls) <= 1.0 + 1e-9)


def test_state_bounds_respected():
    s = cartpole.make_solver(max_iter=500, constrained=True)
    s.set_x0([1.9, 0.0, 0.1, 0.0])
    s.solve()
    sol = s.get_solution()
    assert np.all(sol.states[0, :] <= 2.0 + 1e-9)
    assert np.all(sol.states[0, :] >= -2.0 - 1e-9)


def test_multiple_solver_instances():
    """The reference's singleton allows one solver per process
    (bindings.cpp:15); this framework removes that limitation."""
    s1 = cartpole.make_solver()
    s2 = cartpole.make_solver()
    s1.set_x0([0.5, 0.0, 0.0, 0.0])
    s2.set_x0([-0.5, 0.0, 0.0, 0.0])
    s1.solve()
    s2.solve()
    u1 = s1.get_solution().controls
    u2 = s2.get_solution().controls
    np.testing.assert_allclose(u1, -u2, atol=1e-9)  # symmetric problems


def test_solve_batch_fused_matches_condensed():
    """solve_batch(method='fused') == method='condensed' per lane, including
    ragged batch sizes (padding) and the rocket SOC configuration."""
    from tinympc_julia_tpu import TinyMPCSolver
    from tinympc_julia_tpu.models import rocket

    s = TinyMPCSolver()
    s.setup(cartpole.A, cartpole.B, None, np.diag(cartpole.Q_DIAG),
            np.diag(cartpole.R_DIAG), 1.0, 4, 1, 20, max_iter=200)
    big = 1e17
    s.set_bound_constraints(np.full((4, 20), -big), np.full((4, 20), big),
                            np.full((1, 19), -5.0), np.full((1, 19), 5.0))
    rng = np.random.default_rng(0)
    x0s = rng.uniform(-0.5, 0.5, size=(37, 4))  # ragged: exercises padding
    xf, uf, itf, okf = s.solve_batch(x0s, method="fused")
    xc, uc, itc, okc = s.solve_batch(x0s, method="condensed")
    assert xf.shape == xc.shape and uf.shape == uc.shape
    both = (okf == 1) & (okc == 1)
    assert both.sum() > 30
    np.testing.assert_array_equal(itf[both], itc[both])
    np.testing.assert_allclose(uf[both], uc[both], atol=2e-4)

    r = rocket.make_solver(max_iter=200)
    x0s = rocket.X_INIT[None, :] + rng.uniform(-0.1, 0.1, size=(19, 6))
    xf, uf, itf, okf = r.solve_batch(x0s, method="fused")
    xc, uc, itc, okc = r.solve_batch(x0s, method="condensed")
    both = (okf == 1) & (okc == 1)
    assert both.sum() > 12
    # the API path runs f64 under the test config while the kernel is f32 —
    # allow a one-iteration flip at the tolerance boundary
    assert (np.abs(itf[both] - itc[both]) <= 1).all()
    np.testing.assert_allclose(uf[both], uc[both], atol=5e-3)
