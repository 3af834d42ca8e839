"""Native C-ABI runtime (native/tinympc_native.cpp) vs the JAX solver and the
golden reference fixtures."""
import os
import shutil

import numpy as np
import pytest

from tinympc_julia_tpu.models import cartpole, rocket

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ compiler")

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def native():
    from tinympc_julia_tpu.native import NativeSolver
    s = NativeSolver()
    yield s
    s.cleanup()


class TestNativeParity:
    def test_cartpole_one_solve_vs_golden(self, native):
        """Native runtime must reproduce the compiled reference binary's
        cartpole solve (tests/golden/cartpole_one_solve.npz) exactly."""
        path = os.path.join(GOLDEN, "cartpole_one_solve.npz")
        if not os.path.exists(path):
            pytest.skip("golden fixture missing")
        g = np.load(path)
        native.setup(cartpole.A, cartpole.B, None, np.diag(cartpole.Q_DIAG),
                     np.diag(cartpole.R_DIAG), 1.0, 4, 1, 20,
                     max_iter=10, en_state_bound=False, en_input_bound=False)
        native.set_x0([0.5, 0.0, 0.0, 0.0])
        native.solve()
        states, controls = native.get_solution()
        np.testing.assert_allclose(controls, g["solve_u"], atol=1e-9)
        np.testing.assert_allclose(states, g["solve_x"], atol=1e-9)

    def test_cartpole_mpc_vs_jax(self, native):
        """Warm-started closed loop: native runtime tracks the JAX solver."""
        s = cartpole.make_solver(max_iter=100, constrained=True)
        native.setup(cartpole.A, cartpole.B, None, np.diag(cartpole.Q_DIAG),
                     np.diag(cartpole.R_DIAG), 1.0, 4, 1, 20,
                     max_iter=100, en_state_bound=False, en_input_bound=False)
        x_min = np.full((4, 20), -1e17)
        x_max = np.full((4, 20), 1e17)
        x_min[0, :] = -2.0
        x_max[0, :] = 2.0
        u_min = np.full((1, 19), -5.0)
        u_max = np.full((1, 19), 5.0)
        native.set_bound_constraints(x_min, x_max, u_min, u_max)

        x = np.array([0.0, 0.0, 0.1, 0.0])
        for t in range(30):
            s.set_x0(x)
            s.solve()
            u_jax = s.get_solution().controls[:, 0]
            native.set_x0(x)
            native.solve()
            _, controls = native.get_solution()
            np.testing.assert_allclose(controls[:, 0], u_jax, atol=1e-9,
                                       err_msg=f"step {t}")
            x = cartpole.simulate(x, u_jax)

    def test_rocket_cones_vs_jax(self, native):
        s = rocket.make_solver(max_iter=80)
        s.set_x0(rocket.X_INIT)
        Xref, Uref = rocket.reference_trajectory(0)
        s.set_x_ref(Xref)
        s.set_u_ref(Uref)
        s.solve()
        sol = s.get_solution()

        native.setup(rocket.A, rocket.B, rocket.F, np.diag(rocket.Q_DIAG),
                     np.diag(rocket.R_DIAG), 1.0, 6, 3, 10,
                     max_iter=80, abs_pri_tol=2e-3, abs_dua_tol=1e-3,
                     en_state_bound=False, en_input_bound=False)
        native.set_bound_constraints(*rocket.bounds())
        native.set_cone_constraints([0], [3], [rocket.MU_INPUT],
                                    [0], [3], [rocket.MU_STATE])
        native.set_x0(rocket.X_INIT)
        native.set_x_ref(Xref)
        native.set_u_ref(Uref)
        native.solve()
        _, controls = native.get_solution()
        np.testing.assert_allclose(controls, sol.controls, atol=1e-9)

    def test_residuals_exposed(self, native):
        """First-class residual access — what the reference locks inside the
        workspace (SURVEY.md §5.5)."""
        native.setup(cartpole.A, cartpole.B, None, np.diag(cartpole.Q_DIAG),
                     np.diag(cartpole.R_DIAG), 1.0, 4, 1, 20,
                     max_iter=100, en_state_bound=False, en_input_bound=False)
        native.set_x0([0.2, 0.0, 0.0, 0.0])
        assert native.solve() == 0
        ps, pi, ds, di = native.get_residuals()
        assert ps < 1e-3 and pi < 1e-3 and ds < 1e-3 and di < 1e-3
