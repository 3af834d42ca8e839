"""Settings behavior mirroring /root/reference/tests/test_settings.jl."""
import numpy as np
import pytest

from tinympc_julia_tpu.models import cartpole


def test_custom_tolerances_setup():
    # test_settings.jl:17-32
    s = cartpole.make_solver(abs_pri_tol=1e-5, abs_dua_tol=1e-5, max_iter=300)
    s.set_x0([0.1, 0.0, 0.0, 0.0])
    status = s.solve()
    assert status == 0
    # Residuals stored on the final check must satisfy the tight tolerances.
    assert float(s.state.primal_residual_state) < 1e-5
    assert float(s.state.dual_residual_input) < 1e-5


def test_update_settings_roundtrip_then_solve():
    # test_settings.jl:34-64: all-params update then solve.
    s = cartpole.make_solver()
    s.update_settings(
        abs_pri_tol=2e-3, abs_dua_tol=2e-3, max_iter=77, check_termination=2,
        en_state_bound=False, en_input_bound=False, en_state_soc=False,
        en_input_soc=False, en_state_linear=False, en_input_linear=False,
        adaptive_rho=False, adaptive_rho_min=0.5, adaptive_rho_max=50.0,
        adaptive_rho_enable_clipping=True)
    assert s.settings.max_iter == 77
    assert s.settings.check_termination == 2
    s.set_x0([0.5, 0.0, 0.0, 0.0])
    assert s.solve() in (0, 1)
    # check_termination=2 -> iteration count must be even on convergence.
    assert int(s.solution.iter) % 2 == 0


def test_adaptive_rho_settings_accepted():
    # test_settings.jl:66-76 — and unlike the reference (which needs
    # codegen-provided sensitivities), the adaptive solve actually runs here
    # because sensitivities are computed exactly at setup.
    s = cartpole.make_solver(adaptive_rho=True, adaptive_rho_min=0.5,
                             adaptive_rho_max=5.0)
    assert s.settings.adaptive_rho
    s.set_x0([0.5, 0.0, 0.0, 0.0])
    assert s.solve() in (0, 1)
    assert 0.5 <= float(s.cache.rho) <= 5.0


def test_max_iter_one_no_crash():
    # test_settings.jl:78-92
    s = cartpole.make_solver(max_iter=1)
    s.set_x0([0.5, 0.0, 0.0, 0.0])
    status = s.solve()
    assert status >= 0
    assert int(s.solution.iter) == 1


def test_tolerance_change_does_not_recompile():
    """Tolerances/rho-limits are traced Settings leaves (types.py contract):
    changing them re-runs the same compiled program — no recompilation —
    while flipping a static flag does recompile."""
    from tinympc_julia_tpu.ops import admm

    s = cartpole.make_solver(max_iter=200)
    s.set_x0([0.5, 0.0, 0.0, 0.0])
    assert s.solve() == 0
    iters_loose = int(s.solution.iter)
    n_compiles = admm.solve._cache_size()

    s2 = cartpole.make_solver(max_iter=200, abs_pri_tol=1e-7,
                              abs_dua_tol=1e-7)
    s2.set_x0([0.5, 0.0, 0.0, 0.0])
    assert s2.solve() == 0
    assert admm.solve._cache_size() == n_compiles, \
        "tolerance change must not trigger recompilation"
    # the tighter tolerance genuinely took effect (more iterations)
    assert int(s2.solution.iter) > iters_loose

    # a static-flag change DOES compile a new program
    s3 = cartpole.make_solver(max_iter=201)
    s3.set_x0([0.5, 0.0, 0.0, 0.0])
    assert s3.solve() == 0
    assert admm.solve._cache_size() == n_compiles + 1


def test_update_settings_relaxation_alpha():
    """relaxation_alpha is settable through update_settings (framework
    extension; default 1.0 = reference behavior)."""
    s = cartpole.make_solver(max_iter=300)
    s.update_settings(relaxation_alpha=1.6)
    assert s.settings.relaxation_alpha == 1.6
    s.set_x0([0.5, 0.0, 0.0, 0.0])
    assert s.solve() == 0


def test_check_termination_zero_disables():
    """check_termination=0 runs exactly max_iter iterations (the reference
    would modulo-by-zero; this framework defines 0 = disabled)."""
    s = cartpole.make_solver(max_iter=12)
    s.update_settings(check_termination=0)
    s.set_x0([0.01, 0.0, 0.0, 0.0])
    status = s.solve()
    assert status == 1  # never "converges" by check
    assert int(s.solution.iter) == 12


def test_bf16_head_iters_through_api():
    """Settings.bf16_head_iters stages the fused path through the public
    API (on CPU DEFAULT == f32, so results match the unstaged solve
    exactly); adaptive_rho rejects it."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import pytest
    from tinympc_julia_tpu import TinyMPCSolver
    from tinympc_julia_tpu.models import cartpole

    N = cartpole.HORIZON
    rng = np.random.default_rng(0)
    x0s = rng.uniform(-0.5, 0.5, size=(16, 4))

    def solver():
        s = TinyMPCSolver(dtype=jnp.float32)
        s.setup(np.asarray(cartpole.A), np.asarray(cartpole.B), None,
                np.diag(cartpole.Q_DIAG), np.diag(cartpole.R_DIAG), 1.0,
                4, 1, N, max_iter=100)
        s.set_bound_constraints(np.full((4, N), -1e17), np.full((4, N), 1e17),
                                np.full((1, N - 1), -5.0),
                                np.full((1, N - 1), 5.0))
        return s

    a = solver()
    xs_a, us_a, it_a, ok_a = a.solve_batch(x0s, method="fused")
    b = solver()
    b.update_settings(bf16_head_iters=8)
    xs_b, us_b, it_b, ok_b = b.solve_batch(x0s, method="fused")
    np.testing.assert_array_equal(ok_a, ok_b)
    # head checks only at its end: early lanes latch at 8, later ones equal
    early = it_b == 8
    assert np.all(it_a[early] <= 8)
    np.testing.assert_array_equal(it_a[~early], it_b[~early])
    np.testing.assert_allclose(us_a[~early], us_b[~early], atol=1e-6)

    c = solver()
    c.update_settings(adaptive_rho=True, bf16_head_iters=8)
    with pytest.raises(ValueError, match="fixed-rho only"):
        c.solve_batch(x0s, method="fused")
