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


class TestNativeAdaptive:
    def test_quadrotor_adaptive_vs_golden(self, native):
        """Native adaptive-rho Taylor branch vs the compiled reference
        binary's run (tests/golden/quadrotor_adaptive.npz), same
        finite-difference sensitivities both sides (VERDICT r2 item 5a)."""
        from tests.test_parity_golden import (QUAD_A, QUAD_B, QUAD_Q, QUAD_R,
                                              QUAD_X0)
        path = os.path.join(GOLDEN, "quadrotor_adaptive.npz")
        spath = os.path.join(GOLDEN, "quadrotor_sensitivities.npz")
        if not (os.path.exists(path) and os.path.exists(spath)):
            pytest.skip("golden fixture missing")
        g = np.load(path)
        sens = np.load(spath)
        native.setup(QUAD_A, QUAD_B, None, QUAD_Q, QUAD_R, 5.0, 12, 4, 20,
                     max_iter=500, adaptive_rho=True,
                     adaptive_rho_min=0.1, adaptive_rho_max=10.0)
        native.set_bound_constraints(np.full((12, 20), -1e17),
                                     np.full((12, 20), 1e17),
                                     np.full((4, 19), -0.5),
                                     np.full((4, 19), 0.5))
        native.update_settings(max_iter=500, en_state_bound=False,
                               en_input_bound=True, adaptive_rho=True,
                               adaptive_rho_min=0.1, adaptive_rho_max=10.0)
        native.set_sensitivity_terms(sens["dKinf"], sens["dPinf"],
                                     sens["dC1"], sens["dC2"])
        native.set_x0(QUAD_X0)
        native.solve()
        states, controls = native.get_solution()
        np.testing.assert_allclose(states, g["solve_x"], atol=1e-6)
        np.testing.assert_allclose(controls, g["solve_u"], atol=1e-6)


class TestNativeCodegen:
    def test_codegen_matches_python_emitter(self, native, tmp_path):
        """The C-ABI codegen symbol (reference bindings.cpp:210-225 parity)
        emits byte-identical files to the Python emitter when both bake the
        same state (cache injected via set_cache_terms)."""
        import filecmp
        s = cartpole.make_solver(max_iter=50)
        s.set_x0([0.5, 0.0, 0.0, 0.0])
        out_py = os.path.join(tmp_path, "py")
        s.codegen(out_py)

        native.setup(cartpole.A, cartpole.B, None, np.diag(cartpole.Q_DIAG),
                     np.diag(cartpole.R_DIAG), 1.0, 4, 1, 20, max_iter=50,
                     en_state_bound=False, en_input_bound=False)
        # bake the JAX problem's own bounds + cache so the data files agree
        xm = np.asarray(s.problem.x_min).T
        xM = np.asarray(s.problem.x_max).T
        um = np.asarray(s.problem.u_min).T
        uM = np.asarray(s.problem.u_max).T
        native.set_bound_constraints(np.clip(xm, -1e30, 1e30),
                                     np.clip(xM, -1e30, 1e30), um, uM)
        native.update_settings(
            max_iter=50,
            en_state_bound=bool(s.settings.en_state_bound),
            en_input_bound=bool(s.settings.en_input_bound))
        c = s.cache
        native.set_cache_terms(np.asarray(c.Kinf), np.asarray(c.Pinf),
                               np.asarray(c.Quu_inv), np.asarray(c.AmBKt))
        native.set_x0([0.5, 0.0, 0.0, 0.0])
        out_c = os.path.join(tmp_path, "c")
        assert native.codegen(out_c) == 0

        for rel in ("tinympc/tiny_data.hpp", "src/tiny_main.cpp",
                    "CMakeLists.txt", "tinympc/tinympc_solver.hpp",
                    "src/tiny_data.cpp"):
            a = os.path.join(out_py, rel)
            b = os.path.join(out_c, rel)
            assert filecmp.cmp(a, b, shallow=False), (
                rel + " differs:\n" + _first_diff(a, b))

    def test_codegen_with_sensitivity_symbol(self, native, tmp_path):
        """codegen_with_sensitivity (bindings.cpp:298-331 parity): stores the
        sensitivities and the emitted project carries them."""
        native.setup(cartpole.A, cartpole.B, None, np.diag(cartpole.Q_DIAG),
                     np.diag(cartpole.R_DIAG), 1.0, 4, 1, 20,
                     max_iter=60, adaptive_rho=True,
                     en_state_bound=False, en_input_bound=False)
        from tinympc_julia_tpu.ops.riccati import compute_sensitivity_autograd
        import jax.numpy as jnp
        dK, dP, dC1, dC2 = (np.asarray(m) for m in compute_sensitivity_autograd(
            jnp.asarray(cartpole.A, jnp.float64),
            jnp.asarray(cartpole.B, jnp.float64),
            jnp.asarray(np.diag(np.asarray(cartpole.Q_DIAG)), jnp.float64),
            jnp.asarray(np.diag(np.asarray(cartpole.R_DIAG)), jnp.float64),
            jnp.asarray(1.0, jnp.float64)))
        out = os.path.join(tmp_path, "sens")
        assert native.codegen_with_sensitivity(out, dK, dP, dC1, dC2) == 0
        data = open(os.path.join(out, "src", "tiny_data.cpp")).read()
        assert "g_dKinf" in data
        header = open(os.path.join(out, "tinympc", "tiny_data.hpp")).read()
        assert "#define TINY_HAS_SENSITIVITY 1" in header

    def test_print_problem_data_verbose_dumps_matrices(self, native, capfd):
        """Verbose print dumps x/u/Kinf/Pinf like the reference
        (bindings.cpp:245-251)."""
        native.setup(cartpole.A, cartpole.B, None, np.diag(cartpole.Q_DIAG),
                     np.diag(cartpole.R_DIAG), 1.0, 4, 1, 20, max_iter=50,
                     en_state_bound=False, en_input_bound=False)
        native.set_x0([0.2, 0.0, 0.0, 0.0])
        native.solve()
        native.lib.print_problem_data(1)
        out = capfd.readouterr().out
        for token in ("States x", "Controls u", "Cache Kinf", "Cache Pinf"):
            assert token in out


def _first_diff(a, b, n=6):
    la = open(a).read().splitlines()
    lb = open(b).read().splitlines()
    out = []
    for i, (x, y) in enumerate(zip(la, lb)):
        if x != y:
            out.append(f"line {i+1}:\n  py: {x}\n  c : {y}")
            if len(out) >= n:
                break
    if len(la) != len(lb):
        out.append(f"length {len(la)} vs {len(lb)}")
    return "\n".join(out) or "(no line diff; trailing bytes?)"
