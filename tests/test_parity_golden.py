"""Golden-iterate parity tests against the compiled reference C++ ADMM.

Fixtures in tests/golden/*.npz are produced by tools/make_golden.py, which
compiles the UNMODIFIED vendored reference core
(/root/reference/src/codegen_src/tinympc/{admm,tiny_api,rho_benchmark}.cpp) and
runs the benchmark configs from the reference examples (SURVEY.md §2.5).

Parity bar: 1e-6 per BASELINE.md north star; most checks pass far tighter
(~1e-9) because both sides run IEEE double.
"""
import os

import numpy as np
import pytest

from tinympc_julia_tpu import TinyMPCSolver

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def load(name):
    path = os.path.join(GOLDEN, name + ".npz")
    if not os.path.exists(path):
        pytest.skip(f"golden fixture {name} missing; run tools/make_golden.py")
    return np.load(path)


CARTPOLE = dict(
    A=np.array([[1.0, 0.01, 0.0, 0.0],
                [0.0, 1.0, 0.039, 0.0],
                [0.0, 0.0, 1.002, 0.01],
                [0.0, 0.0, 0.458, 1.002]]),
    B=np.array([[0.0], [0.02], [0.0], [0.067]]),
    Q=np.diag([10.0, 1.0, 10.0, 1.0]),
    R=np.diag([1.0]),
)


QUAD_A = np.array([
    [1.0, 0.0, 0.0, 0.0, 0.024525, 0.0, 0.05, 0.0, 0.0, 0.0, 0.0002044, 0.0],
    [0.0, 1.0, 0.0, -0.024525, 0.0, 0.0, 0.0, 0.05, 0.0, -0.0002044, 0.0, 0.0],
    [0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.05, 0.0, 0.0, 0.0],
    [0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.025, 0.0, 0.0],
    [0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.025, 0.0],
    [0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.025],
    [0.0, 0.0, 0.0, 0.0, 0.981, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0122625, 0.0],
    [0.0, 0.0, 0.0, -0.981, 0.0, 0.0, 0.0, 1.0, 0.0, -0.0122625, 0.0, 0.0],
    [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0],
    [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0],
    [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0],
    [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0],
])
QUAD_B = np.array([
    [-0.0007069, 0.0007773, 0.0007091, -0.0007795],
    [0.0007034, 0.0007747, -0.0007042, -0.0007739],
    [0.0052554, 0.0052554, 0.0052554, 0.0052554],
    [-0.1720966, -0.1895213, 0.1722891, 0.1893288],
    [-0.1729419, 0.190174, 0.1734809, -0.1907131],
    [0.0123423, -0.0045148, -0.0174024, 0.0095748],
    [-0.056552, 0.0621869, 0.0567283, -0.0623632],
    [0.0562756, 0.0619735, -0.0563386, -0.0619105],
    [0.2102143, 0.2102143, 0.2102143, 0.2102143],
    [-13.7677303, -15.1617018, 13.7831318, 15.1463003],
    [-13.8353509, 15.2139209, 13.8784751, -15.2570451],
    [0.9873856, -0.361182, -1.392188, 0.7659845],
])
QUAD_Q = np.diag([100.0, 100.0, 100.0, 4.0, 4.0, 400.0,
                  4.0, 4.0, 4.0, 2.0408163, 2.0408163, 4.0])
QUAD_R = np.diag([4.0, 4.0, 4.0, 4.0])
QUAD_X0 = np.array([0.1, -0.2, 0.3, 0.05, -0.05, 0.1, 0.2, -0.1, 0.15,
                    0.0, 0.0, 0.0])


def make_cartpole(max_iter=10, **kw):
    s = TinyMPCSolver()
    s.setup(CARTPOLE["A"], CARTPOLE["B"], None, CARTPOLE["Q"], CARTPOLE["R"],
            1.0, 4, 1, 20, max_iter=max_iter, **kw)
    return s


class TestCacheParity:
    def test_cartpole_cache(self):
        g = load("cartpole_one_solve")
        s = make_cartpole()
        np.testing.assert_allclose(np.asarray(s.cache.Kinf), g["cache_Kinf"],
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(s.cache.Pinf), g["cache_Pinf"],
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray(s.cache.Quu_inv),
                                   g["cache_Quu_inv"], atol=1e-10)
        np.testing.assert_allclose(np.asarray(s.cache.AmBKt),
                                   g["cache_AmBKt"], atol=1e-8)

    def test_quadrotor_cache(self):
        g = load("quadrotor_hover")
        s = TinyMPCSolver()
        s.setup(QUAD_A, QUAD_B, None, QUAD_Q, QUAD_R, 5.0, 12, 4, 20,
                max_iter=500)
        np.testing.assert_allclose(np.asarray(s.cache.Kinf), g["cache_Kinf"],
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray(s.cache.Pinf), g["cache_Pinf"],
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(s.cache.Quu_inv),
                                   g["cache_Quu_inv"], atol=1e-10)
        np.testing.assert_allclose(np.asarray(s.cache.AmBKt),
                                   g["cache_AmBKt"], atol=1e-7)


class TestSolveParity:
    def test_cartpole_one_solve(self):
        g = load("cartpole_one_solve")
        s = make_cartpole(max_iter=10)
        s.set_x0([0.5, 0.0, 0.0, 0.0])
        s.solve()
        assert int(s.solution.iter) == int(g["solve_iter"][0, 0])
        assert int(s.solution.solved) == int(g["solve_solved"][0, 0])
        np.testing.assert_allclose(np.asarray(s.solution.x).T, g["solve_x"],
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(s.solution.u).T, g["solve_u"],
                                   atol=1e-9)
        np.testing.assert_allclose(
            float(s.state.primal_residual_state), g["solve_pri_state"][0, 0],
            atol=1e-9)
        np.testing.assert_allclose(
            float(s.state.dual_residual_input), g["solve_dua_input"][0, 0],
            atol=1e-9)

    def test_cartpole_iterates(self):
        """Per-iteration parity: fresh solver, zero tolerances, max_iter=k."""
        g = load("cartpole_iterates")
        for k in range(1, 11):
            s = make_cartpole(max_iter=k, abs_pri_tol=0.0, abs_dua_tol=0.0)
            s.set_x0([0.5, 0.0, 0.0, 0.0])
            s.solve()
            assert int(s.solution.iter) == k
            np.testing.assert_allclose(
                np.asarray(s.solution.x).T, g[f"k{k}_x"], atol=1e-9,
                err_msg=f"iterate {k} states diverged")
            np.testing.assert_allclose(
                np.asarray(s.solution.u).T, g[f"k{k}_u"], atol=1e-9,
                err_msg=f"iterate {k} controls diverged")

    def test_cartpole_mpc_closed_loop(self):
        """Warm-started closed loop: 60 steps, box constraints; per-step
        controls and iteration counts must track the reference."""
        g = load("cartpole_mpc")
        s = make_cartpole(max_iter=100)
        x_min = np.full((4, 20), -1e17)
        x_max = np.full((4, 20), 1e17)
        x_min[0, :] = -2.0
        x_max[0, :] = 2.0
        s.set_bound_constraints(x_min, x_max,
                                np.full((1, 19), -5.0), np.full((1, 19), 5.0))
        x = np.array([0.0, 0.0, 0.1, 0.0])
        A, B = CARTPOLE["A"], CARTPOLE["B"]
        nsteps = g["mpc_us"].shape[1]
        for t in range(nsteps):
            s.set_x0(x)
            s.solve()
            sol = s.get_solution()
            u = sol.controls[:, 0]
            np.testing.assert_allclose(x, g["mpc_xs"][:, t], atol=1e-6,
                                       err_msg=f"state diverged at step {t}")
            np.testing.assert_allclose(u, g["mpc_us"][:, t], atol=1e-6,
                                       err_msg=f"control diverged at step {t}")
            assert int(s.solution.iter) == int(g["mpc_iters"][0, t]), \
                f"iteration count diverged at step {t}"
            x = A @ x + B @ u
        np.testing.assert_allclose(np.asarray(s.solution.x).T,
                                   g["mpc_final_vnew"], atol=1e-6)
        np.testing.assert_allclose(np.asarray(s.solution.u).T,
                                   g["mpc_final_znew"], atol=1e-6)

    def test_quadrotor_hover(self):
        g = load("quadrotor_hover")
        s = TinyMPCSolver()
        s.setup(QUAD_A, QUAD_B, None, QUAD_Q, QUAD_R, 5.0, 12, 4, 20,
                max_iter=500)
        s.set_bound_constraints(np.full((12, 20), -1e17),
                                np.full((12, 20), 1e17),
                                np.full((4, 19), -0.5), np.full((4, 19), 0.5))
        s.update_settings(en_state_bound=False)
        s.set_x0(QUAD_X0)
        s.solve()
        assert int(s.solution.iter) == int(g["solve_iter"][0, 0])
        assert int(s.solution.solved) == int(g["solve_solved"][0, 0])
        np.testing.assert_allclose(np.asarray(s.solution.x).T, g["solve_x"],
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray(s.solution.u).T, g["solve_u"],
                                   atol=1e-7)

    def test_cartpole_tracking(self):
        g = load("cartpole_tracking")
        s = make_cartpole(max_iter=200)
        N = 20
        Xref = np.zeros((4, N))
        Uref = np.zeros((1, N - 1))
        for i in range(N):
            Xref[0, i] = 0.5 * np.sin(0.1 * i)
            Xref[2, i] = 0.05 * np.cos(0.2 * i)
        for i in range(N - 1):
            Uref[0, i] = 0.01 * i
        s.set_x_ref(Xref)
        s.set_u_ref(Uref)
        s.set_x0([0.3, 0.0, -0.05, 0.0])
        s.solve()
        assert int(s.solution.iter) == int(g["solve_iter"][0, 0])
        np.testing.assert_allclose(np.asarray(s.solution.x).T, g["solve_x"],
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(s.solution.u).T, g["solve_u"],
                                   atol=1e-8)


class TestAdaptiveRhoParity:
    def test_quadrotor_adaptive(self):
        """Adaptive-rho path with the same finite-difference sensitivities the
        reference binary used (tests/golden/quadrotor_sensitivities.npz)."""
        g = load("quadrotor_adaptive")
        sens = load("quadrotor_sensitivities")
        s = TinyMPCSolver()
        s.setup(QUAD_A, QUAD_B, None, QUAD_Q, QUAD_R, 5.0, 12, 4, 20,
                max_iter=500, adaptive_rho=True,
                adaptive_rho_min=0.1, adaptive_rho_max=10.0)
        s.set_bound_constraints(np.full((12, 20), -1e17),
                                np.full((12, 20), 1e17),
                                np.full((4, 19), -0.5), np.full((4, 19), 0.5))
        s.update_settings(en_state_bound=False, adaptive_rho=True)
        s.cache = s.cache.replace(
            dKinf_drho=sens["dKinf"].astype(np.float64),
            dPinf_drho=sens["dPinf"].astype(np.float64),
            dC1_drho=sens["dC1"].astype(np.float64),
            dC2_drho=sens["dC2"].astype(np.float64))
        s.set_x0(QUAD_X0)
        s.solve()
        assert int(s.solution.iter) == int(g["solve_iter"][0, 0])
        np.testing.assert_allclose(float(s.cache.rho), g["final_rho"][0, 0],
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(s.cache.Kinf), g["final_Kinf"],
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(s.solution.x).T, g["solve_x"],
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(s.solution.u).T, g["solve_u"],
                                   atol=1e-6)
