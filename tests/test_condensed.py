"""Condensed-iteration formulation + over-relaxation tests."""
import numpy as np
import jax
import jax.numpy as jnp

from tinympc_julia_tpu import Settings, init_state, make_problem, precompute_cache
from tinympc_julia_tpu.models import cartpole, quadrotor
from tinympc_julia_tpu.ops import admm
from tinympc_julia_tpu.ops.condensed import build_condensed, solve_condensed
from tinympc_julia_tpu.parallel import broadcast_state, set_x0_batch
from tinympc_julia_tpu.parallel.batch import solve_batch


def _mk(model, rho, ub, N=20, x_bounds=None):
    p = make_problem(jnp.asarray(model.A), jnp.asarray(model.B),
                     jnp.asarray(np.diag(model.Q_DIAG)),
                     jnp.asarray(np.diag(model.R_DIAG)), rho, N,
                     u_min=-ub, u_max=ub,
                     x_min=None if x_bounds is None else -x_bounds,
                     x_max=x_bounds)
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(rho, p.A.dtype))
    return p, c


class TestCondensed:
    def test_matches_sequential_exactly(self):
        """In float64 the condensed path reproduces the sequential ADMM
        bit-for-bit(-tolerance): same per-lane iteration counts, same
        solutions."""
        p, c = _mk(cartpole, 1.0, 5.0)
        s = Settings(max_iter=100, en_state_bound=False, en_input_bound=True)
        rng = np.random.default_rng(0)
        B = 64
        x0s = jnp.asarray(rng.uniform(-0.5, 0.5, size=(B, 4)))
        xs, us, iters, solved = solve_condensed(p, c, s, x0s)

        st0 = set_x0_batch(
            broadcast_state(init_state(4, 1, 20, p.A.dtype), B), x0s)
        _, _, sol = solve_batch(p, c, s, st0)
        np.testing.assert_array_equal(np.asarray(iters), np.asarray(sol.iter))
        np.testing.assert_array_equal(np.asarray(solved),
                                      np.asarray(sol.solved))
        np.testing.assert_allclose(np.asarray(us), np.asarray(sol.u),
                                   atol=1e-11)
        np.testing.assert_allclose(np.asarray(xs), np.asarray(sol.x),
                                   atol=1e-11)

    def test_quadrotor_with_state_bounds(self):
        p, c = _mk(quadrotor, 5.0, 0.5, x_bounds=np.full(12, 2.0))
        s = Settings(max_iter=300, en_state_bound=True, en_input_bound=True)
        rng = np.random.default_rng(1)
        B = 16
        x0s = jnp.asarray(rng.uniform(-0.3, 0.3, size=(B, 12)))
        xs, us, iters, solved = solve_condensed(p, c, s, x0s)
        st0 = set_x0_batch(
            broadcast_state(init_state(12, 4, 20, p.A.dtype), B), x0s)
        _, _, sol = solve_batch(p, c, s, st0)
        np.testing.assert_array_equal(np.asarray(iters), np.asarray(sol.iter))
        np.testing.assert_allclose(np.asarray(us), np.asarray(sol.u),
                                   atol=1e-10)

    def test_tracking_references(self):
        """Nonzero Xref/Uref flow through the condensed maps."""
        rng = np.random.default_rng(2)
        Xref = rng.normal(size=(20, 4)) * 0.1
        Uref = rng.normal(size=(19, 1)) * 0.05
        p = make_problem(jnp.asarray(cartpole.A), jnp.asarray(cartpole.B),
                         jnp.asarray(np.diag(cartpole.Q_DIAG)),
                         jnp.asarray(np.diag(cartpole.R_DIAG)), 1.0, 20,
                         u_min=-5.0, u_max=5.0,
                         Xref=jnp.asarray(Xref), Uref=jnp.asarray(Uref))
        c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(1.0, p.A.dtype))
        s = Settings(max_iter=200, en_state_bound=False, en_input_bound=True)
        B = 8
        x0s = jnp.asarray(rng.uniform(-0.3, 0.3, size=(B, 4)))
        xs, us, iters, solved = solve_condensed(p, c, s, x0s)
        st0 = set_x0_batch(
            broadcast_state(init_state(4, 1, 20, p.A.dtype), B), x0s)
        _, _, sol = solve_batch(p, c, s, st0)
        np.testing.assert_array_equal(np.asarray(iters), np.asarray(sol.iter))
        np.testing.assert_allclose(np.asarray(us), np.asarray(sol.u),
                                   atol=1e-10)


class TestCondensedConstraints:
    def test_rocket_cones_match_sequential(self):
        """Full constraint stack (box + SOC + affine f) in the condensed
        path matches the sequential solver exactly in f64."""
        from tinympc_julia_tpu.models import rocket
        from tinympc_julia_tpu import ConeSet
        p = make_problem(
            jnp.asarray(rocket.A), jnp.asarray(rocket.B),
            jnp.asarray(np.diag(rocket.Q_DIAG)),
            jnp.asarray(np.diag(rocket.R_DIAG)), 1.0, 10,
            f=jnp.asarray(rocket.F),
            x_min=jnp.asarray(rocket.bounds()[0].T),
            x_max=jnp.asarray(rocket.bounds()[1].T),
            u_min=-10.0, u_max=105.0,
            cones_u=ConeSet(mus=jnp.asarray([rocket.MU_INPUT]),
                            starts=(0,), dims=(3,)),
            cones_x=ConeSet(mus=jnp.asarray([rocket.MU_STATE]),
                            starts=(0,), dims=(3,)))
        Xref, Uref = rocket.reference_trajectory(0)
        p = p.replace(Xref=jnp.asarray(Xref.T), Uref=jnp.asarray(Uref.T))
        c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(1.0, p.A.dtype))
        s = Settings(max_iter=80, abs_pri_tol=2e-3, en_state_bound=True,
                     en_input_bound=True, en_state_soc=True,
                     en_input_soc=True)
        B = 4
        rng = np.random.default_rng(7)
        x0s = jnp.asarray(rocket.X_INIT[None, :]
                          * rng.uniform(0.9, 1.1, size=(B, 1)))
        xs, us, iters, solved = solve_condensed(p, c, s, x0s)
        st0 = set_x0_batch(
            broadcast_state(init_state(6, 3, 10, p.A.dtype), B), x0s)
        _, _, sol = solve_batch(p, c, s, st0)
        np.testing.assert_array_equal(np.asarray(iters), np.asarray(sol.iter))
        np.testing.assert_allclose(np.asarray(us), np.asarray(sol.u),
                                   atol=1e-10)

    def test_linear_constraints_match_sequential(self):
        p = make_problem(jnp.asarray(cartpole.A), jnp.asarray(cartpole.B),
                         jnp.asarray(np.diag(cartpole.Q_DIAG)),
                         jnp.asarray(np.diag(cartpole.R_DIAG)), 1.0, 20,
                         u_min=-5.0, u_max=5.0,
                         Alin_x=np.array([[1.0, 0.5, 0.0, 0.0]]),
                         blin_x=np.array([0.4]))
        c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(1.0, p.A.dtype))
        s = Settings(max_iter=300, en_state_bound=False, en_input_bound=True,
                     en_state_linear=True)
        B = 4
        rng = np.random.default_rng(8)
        x0s = jnp.asarray(rng.uniform(-0.4, 0.4, size=(B, 4)))
        xs, us, iters, solved = solve_condensed(p, c, s, x0s)
        st0 = set_x0_batch(
            broadcast_state(init_state(4, 1, 20, p.A.dtype), B), x0s)
        _, _, sol = solve_batch(p, c, s, st0)
        np.testing.assert_array_equal(np.asarray(iters), np.asarray(sol.iter))
        np.testing.assert_allclose(np.asarray(us), np.asarray(sol.u),
                                   atol=1e-10)
        # constraint satisfied on returned plans
        lhs = np.asarray(xs)[:, :, 0] + 0.5 * np.asarray(xs)[:, :, 1]
        assert np.all(lhs <= 0.4 + 1e-6)


class TestOverRelaxation:
    def test_alpha_one_is_reference(self):
        """relaxation_alpha=1.0 must not change anything (golden parity tests
        already pin this globally; direct check here)."""
        p, c = _mk(cartpole, 1.0, 1.0)
        st = init_state(4, 1, 20, p.A.dtype)
        st = st.replace(x=st.x.at[0].set(jnp.asarray([1.0, 0.0, 0.2, 0.0])))
        s1 = Settings(max_iter=100, en_state_bound=False, en_input_bound=True)
        s2 = s1.replace(relaxation_alpha=1.0)
        _, _, a = admm.solve(p, c, s1, st)
        _, _, b = admm.solve(p, c, s2, st)
        np.testing.assert_array_equal(np.asarray(a.u), np.asarray(b.u))

    def test_alpha_accelerates_and_agrees(self):
        """alpha=1.6 converges in fewer iterations to the same solution
        (within tolerance-level difference)."""
        p, c = _mk(cartpole, 1.0, 1.0)
        st = init_state(4, 1, 20, p.A.dtype)
        st = st.replace(x=st.x.at[0].set(jnp.asarray([1.5, 0.0, 0.3, 0.0])))
        tight = dict(abs_pri_tol=1e-6, abs_dua_tol=1e-6)
        s1 = Settings(max_iter=2000, en_state_bound=False, en_input_bound=True,
                      **tight)
        s2 = s1.replace(relaxation_alpha=1.6)
        _, _, a = admm.solve(p, c, s1, st)
        _, _, b = admm.solve(p, c, s2, st)
        assert int(b.iter) < int(a.iter), (int(a.iter), int(b.iter))
        assert int(b.solved) == 1
        np.testing.assert_allclose(np.asarray(b.u), np.asarray(a.u),
                                   atol=1e-4)

    def test_condensed_alpha_matches_sequential_alpha(self):
        p, c = _mk(cartpole, 1.0, 5.0)
        s = Settings(max_iter=100, en_state_bound=False, en_input_bound=True,
                     relaxation_alpha=1.7)
        rng = np.random.default_rng(3)
        B = 32
        x0s = jnp.asarray(rng.uniform(-0.5, 0.5, size=(B, 4)))
        xs, us, iters, solved = solve_condensed(p, c, s, x0s)
        st0 = set_x0_batch(
            broadcast_state(init_state(4, 1, 20, p.A.dtype), B), x0s)
        _, _, sol = solve_batch(p, c, s, st0)
        np.testing.assert_array_equal(np.asarray(iters), np.asarray(sol.iter))
        np.testing.assert_allclose(np.asarray(us), np.asarray(sol.u),
                                   atol=1e-11)


def test_t2_dual_blocks_are_exact_negations():
    """The duals enter T2 only through rho (y - znew) / rho (g - vnew), so
    the y/g coefficient blocks are bit-exact negations of the z/v blocks —
    the identity behind the reduced backward contraction."""
    p, c = _mk(cartpole, 1.0, 5.0)
    rng = np.random.default_rng(7)
    p = p.replace(Xref=jnp.asarray(rng.normal(size=(20, 4)) * 0.1),
                  Uref=jnp.asarray(rng.normal(size=(19, 1)) * 0.05))
    T2 = np.asarray(build_condensed(p, c).T2)
    su, sx = 19, 80
    np.testing.assert_array_equal(T2[:, su + sx:su + sx + su], -T2[:, :su])
    np.testing.assert_array_equal(T2[:, su + sx + su:-1], -T2[:, su:su + sx])


class TestAutoDispatch:
    """method='auto' policy: condensed while the maps fit the budget, then
    chunked condensation (ops/scans.build_chunk_maps), then the sequential
    scan (measured: no solve-rate crossover on TPU within the budget;
    chunked wins 2.5-3x beyond it — DESIGN.md §3)."""

    def test_auto_uses_condensed_at_n100(self):
        from tinympc_julia_tpu.ops.condensed import auto_uses_condensed
        assert auto_uses_condensed(4, 1, 100)
        assert auto_uses_condensed(12, 4, 100)

    def test_auto_switches_beyond_budget(self):
        from tinympc_julia_tpu.ops import condensed as cnd
        # cartpole N=2048: footprint ~1 GB > 256 MB budget
        assert not cnd.auto_uses_condensed(4, 1, 2048)
        fp = cnd.condensed_footprint_bytes(4, 1, 2048)
        assert fp > cnd.AUTO_CONDENSED_BUDGET_BYTES

    def test_api_auto_respects_budget(self, monkeypatch):
        """At N=100 auto builds the condensed maps; with a tiny budget it
        rides the standard path and never builds them."""
        import numpy as np
        from tinympc_julia_tpu import TinyMPCSolver
        from tinympc_julia_tpu.models import cartpole
        from tinympc_julia_tpu.ops import condensed as cnd

        def mk():
            s = TinyMPCSolver()
            s.setup(cartpole.A, cartpole.B, None, np.diag(cartpole.Q_DIAG),
                    np.diag(cartpole.R_DIAG), 1.0, 4, 1, 100, max_iter=20)
            s.update_settings(en_state_bound=False, en_input_bound=False)
            return s
        x0s = np.random.default_rng(0).uniform(-0.3, 0.3, size=(4, 4))

        s = mk()
        xs, us, it, ok = s.solve_batch(x0s, method="auto")
        assert s._condensed_maps is not None  # condensed path taken

        monkeypatch.setattr(cnd, "AUTO_CONDENSED_BUDGET_BYTES", 1)
        s2 = mk()
        xs2, us2, it2, ok2 = s2.solve_batch(x0s, method="auto")
        assert s2._condensed_maps is None     # chunked path taken instead
        assert s2._chunk_maps is not None
        # both paths agree (f64 exact-parity contract)
        np.testing.assert_array_equal(it, it2)
        np.testing.assert_allclose(us, us2, atol=1e-9)
