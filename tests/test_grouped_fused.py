"""Grouped (per-instance problem) Pallas fused kernel + GroupedBatchSolver.

Pins the group-grid fused kernel per-lane against the grouped XLA condensed
path and the standard problem_batched path (interpret mode on CPU; Mosaic on
real TPU via bench.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tinympc_julia_tpu import Settings, make_problem, precompute_cache
from tinympc_julia_tpu.models import cartpole, quadrotor
from tinympc_julia_tpu.parallel.grouped import (GroupedBatchSolver,
                                                stack_instances)


def _groups(model, G, *, rho, ub_range, N, seed, scale=2e-3):
    rng = np.random.default_rng(seed)
    nx = model.A.shape[0]
    probs, caches = [], []
    for g in range(G):
        A = np.asarray(model.A) + rng.normal(scale=scale, size=(nx, nx))
        B = np.asarray(model.B) * rng.uniform(0.9, 1.1)
        ub = rng.uniform(*ub_range)
        p = make_problem(jnp.asarray(A), jnp.asarray(B),
                         jnp.asarray(np.diag(model.Q_DIAG)),
                         jnp.asarray(np.diag(model.R_DIAG)), rho, N,
                         u_min=-ub, u_max=ub)
        c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(rho, p.A.dtype))
        probs.append(p)
        caches.append(c)
    return stack_instances(probs), stack_instances(caches)


class TestGroupedFused:
    def test_cartpole_fused_matches_condensed(self):
        G, L = 3, 16
        probs, caches = _groups(cartpole, G, rho=1.0, ub_range=(3.0, 6.0),
                                N=20, seed=0)
        s = Settings(max_iter=100, en_state_bound=False, en_input_bound=True)
        gs = GroupedBatchSolver(probs, caches, s)
        rng = np.random.default_rng(1)
        x0s = rng.uniform(-0.5, 0.5, size=(G, L, 4))

        xs_c, us_c, it_c, sv_c = gs.solve_batch(x0s, method="condensed")
        xs_f, us_f, it_f, sv_f = gs.solve_batch(x0s, method="fused")
        np.testing.assert_array_equal(it_c, it_f)
        np.testing.assert_array_equal(sv_c, sv_f)
        np.testing.assert_allclose(us_c, us_f, atol=2e-4)
        np.testing.assert_allclose(xs_c, xs_f, atol=2e-4)
        assert sv_f.sum() > 0

    def test_quadrotor_fused_matches_standard(self):
        """The VERDICT round-1 done-criterion: randomized quadrotor problems
        on the fused path, pinned per-lane against the standard
        problem_batched path."""
        G, L = 4, 8
        probs, caches = _groups(quadrotor, G, rho=5.0, ub_range=(0.35, 0.6),
                                N=12, seed=2)
        s = Settings(max_iter=150, en_state_bound=False, en_input_bound=True)
        gs = GroupedBatchSolver(probs, caches, s)
        rng = np.random.default_rng(3)
        x0s = rng.uniform(-0.25, 0.25, size=(G, L, 12))

        xs_f, us_f, it_f, sv_f = gs.solve_batch(x0s, method="fused")
        xs_s, us_s, it_s, sv_s = gs.solve_batch(x0s, method="standard")
        np.testing.assert_array_equal(it_s, it_f)
        np.testing.assert_array_equal(sv_s, sv_f)
        np.testing.assert_allclose(us_s, us_f, atol=3e-4)
        assert sv_f.sum() > 0

    def test_per_group_bounds_ride_fused(self):
        """Bounds genuinely differ per group; returned controls respect each
        group's own bounds."""
        G, L = 3, 8
        probs, caches = _groups(cartpole, G, rho=1.0, ub_range=(0.5, 5.0),
                                N=20, seed=4)
        s = Settings(max_iter=200, en_state_bound=False, en_input_bound=True)
        gs = GroupedBatchSolver(probs, caches, s)
        rng = np.random.default_rng(5)
        x0s = rng.uniform(-0.6, 0.6, size=(G, L, 4))
        xs, us, iters, solved = gs.solve_batch(x0s, method="fused")
        ub = np.asarray(probs.u_max)[:, 0, 0]  # (G,)
        for g in range(G):
            assert np.all(np.abs(us[g]) <= ub[g] + 1e-5)
        # bounds must actually differ for this test to mean anything
        assert np.ptp(ub) > 0.5

    def test_per_group_cone_data_rejected(self):
        """Per-group SOC mus on the fused path raise with a pointer to the
        condensed path."""
        from tinympc_julia_tpu import ConeSet
        from tinympc_julia_tpu.models import rocket
        G = 2
        probs, caches = [], []
        for g in range(G):
            mu = 0.25 + 0.1 * g
            p = make_problem(
                jnp.asarray(rocket.A), jnp.asarray(rocket.B),
                jnp.asarray(np.diag(rocket.Q_DIAG)),
                jnp.asarray(np.diag(rocket.R_DIAG)), 1.0, 10,
                f=jnp.asarray(rocket.F), u_min=-10.0, u_max=105.0,
                cones_u=ConeSet(mus=jnp.asarray([mu]), starts=(0,),
                                dims=(3,)))
            c = precompute_cache(p.A, p.B, p.Q, p.R,
                                 jnp.asarray(1.0, p.A.dtype))
            probs.append(p)
            caches.append(c)
        gs = GroupedBatchSolver(stack_instances(probs),
                                stack_instances(caches),
                                Settings(max_iter=50, en_input_soc=True,
                                         en_state_bound=False))
        x0s = np.tile(np.asarray(rocket.X_INIT), (G, 8, 1))
        with pytest.raises(ValueError, match="condensed"):
            gs.solve_batch(x0s, method="fused")
        # and the condensed path actually handles it
        xs, us, iters, solved = gs.solve_batch(x0s, method="condensed")
        assert xs.shape == (G, 8, 10, 6)


class TestGroupedPipeline:
    def test_two_phase_matches_single_long_solve(self):
        """The two-phase straggler pipeline is an exact continuation: per-lane
        results equal ONE fused solve of phase1+phase2 iterations (warm-carry
        chaining is bit-exact; per-group compaction keeps T12 alignment)."""
        G, L = 4, 8
        probs, caches = _groups(quadrotor, G, rho=5.0, ub_range=(0.35, 0.6),
                                N=12, seed=2)
        rng = np.random.default_rng(3)
        x0s = rng.uniform(-0.25, 0.25, size=(G, L, 12))

        s_long = Settings(max_iter=150, en_state_bound=False,
                          en_input_bound=True)
        gs_long = GroupedBatchSolver(probs, caches, s_long)
        xs_1, us_1, it_1, sv_1 = gs_long.solve_batch(x0s, method="fused")

        s_p1 = Settings(max_iter=50, en_state_bound=False,
                        en_input_bound=True)
        gs_two = GroupedBatchSolver(probs, caches, s_p1)
        xs_2, us_2, it_2, sv_2 = gs_two.solve_batch(
            x0s, method="fused", pipeline=(50, 8, 100))

        # meaningful only if phase 1 leaves stragglers
        assert (it_1 > 50).any()
        np.testing.assert_array_equal(it_1, it_2)
        np.testing.assert_array_equal(sv_1, sv_2)
        np.testing.assert_array_equal(us_1, us_2)
        np.testing.assert_array_equal(xs_1, xs_2)

    def test_pipeline_pads_non_tile_multiple_lanes(self):
        """solve_batch(pipeline=...) pads lane counts up to a batch-tile
        multiple exactly like the plain fused path (ADVICE r3: the pipeline
        branch used to raise for lane counts the plain path accepted)."""
        G, L = 2, 12  # batch tile resolves to 8 -> lanes pad to 16
        probs, caches = _groups(quadrotor, G, rho=5.0, ub_range=(0.35, 0.6),
                                N=12, seed=2)
        rng = np.random.default_rng(13)
        x0s = rng.uniform(-0.25, 0.25, size=(G, L, 12))

        s_long = Settings(max_iter=150, en_state_bound=False,
                          en_input_bound=True)
        gs_long = GroupedBatchSolver(probs, caches, s_long)
        xs_1, us_1, it_1, sv_1 = gs_long.solve_batch(x0s, method="fused")

        s_p1 = Settings(max_iter=50, en_state_bound=False,
                        en_input_bound=True)
        gs_two = GroupedBatchSolver(probs, caches, s_p1)
        xs_2, us_2, it_2, sv_2 = gs_two.solve_batch(
            x0s, method="fused", pipeline=(50, 8, 100))
        assert xs_2.shape == (G, L, 12, 12)
        np.testing.assert_array_equal(it_1, it_2)
        np.testing.assert_array_equal(sv_1, sv_2)
        np.testing.assert_array_equal(us_1, us_2)

    def test_pipeline_validates_check_termination_alignment(self):
        """Phase budgets must land on check iterations (ADVICE r3: the error
        used to surface from the kernel factory phrased as max_iter)."""
        probs, caches = _groups(quadrotor, 2, rho=5.0, ub_range=(0.35, 0.6),
                                N=12, seed=2)
        s = Settings(max_iter=52, en_state_bound=False, en_input_bound=True,
                     check_termination=4)
        gs = GroupedBatchSolver(probs, caches, s)
        with pytest.raises(ValueError, match="phase1_iters"):
            gs.make_fused_pipeline(phase1_iters=50, straggler_slots=8,
                                   phase2_iters=100, lanes=16)
        with pytest.raises(ValueError, match="phase2_iters"):
            gs.make_fused_pipeline(phase1_iters=52, straggler_slots=8,
                                   phase2_iters=101, lanes=16)

    def test_straggler_overflow_keeps_phase1_state(self):
        """More stragglers than slots: overflow lanes keep their (unconverged)
        phase-1 state instead of corrupting other lanes."""
        G, L = 2, 16
        probs, caches = _groups(quadrotor, G, rho=5.0, ub_range=(0.35, 0.6),
                                N=12, seed=11)
        rng = np.random.default_rng(12)
        x0s = rng.uniform(-0.3, 0.3, size=(G, L, 12))
        s = Settings(max_iter=20, en_state_bound=False, en_input_bound=True)
        gs = GroupedBatchSolver(probs, caches, s)
        xs_s, us_s, it_s, sv_s = gs.solve_batch(x0s, method="fused")
        n_straggle = int((sv_s == 0).sum())
        assert n_straggle > 4  # ensure 4 slots genuinely overflow
        xs_p, us_p, it_p, sv_p = gs.solve_batch(
            x0s, method="fused", pipeline=(20, 4, 100))
        # every lane is either a phase-2 continuation (iters > 20 allowed)
        # or bit-identical to its phase-1 state
        from_phase1 = (it_p == it_s) & (sv_p == sv_s)
        continued = it_p > 20
        assert np.all(from_phase1 | continued)
        # overflow means at least one unconverged lane kept phase-1 state
        assert np.all(sv_p >= sv_s)


class TestAdviceRegressions:
    def test_single_group_fused(self):
        """G=1 is a valid GroupedBatchSolver config on method='fused'
        (ADVICE r2 medium: the 3-D x0s flatten was gated on G > 1 and the
        solve crashed on the groups*tile assertion)."""
        G, L = 1, 16
        probs, caches = _groups(cartpole, G, rho=1.0, ub_range=(3.0, 6.0),
                                N=20, seed=6)
        s = Settings(max_iter=100, en_state_bound=False, en_input_bound=True)
        gs = GroupedBatchSolver(probs, caches, s)
        rng = np.random.default_rng(7)
        x0s = rng.uniform(-0.5, 0.5, size=(G, L, 4))
        xs_f, us_f, it_f, sv_f = gs.solve_batch(x0s, method="fused")
        xs_c, us_c, it_c, sv_c = gs.solve_batch(x0s, method="condensed")
        np.testing.assert_array_equal(it_c, it_f)
        np.testing.assert_array_equal(sv_c, sv_f)
        np.testing.assert_allclose(us_c, us_f, atol=2e-4)
        assert sv_f.sum() > 0

    def test_traced_tolerance_settings_fused_cache(self):
        """Settings with jax-array tolerances (traced leaves, unhashable)
        still work as fused-solver cache keys (ADVICE r2 low: Settings was
        used directly as a dict key)."""
        G, L = 2, 8
        probs, caches = _groups(cartpole, G, rho=1.0, ub_range=(3.0, 6.0),
                                N=20, seed=8)
        s = Settings(max_iter=100, en_state_bound=False, en_input_bound=True,
                     abs_pri_tol=jnp.asarray(1e-3),
                     abs_dua_tol=jnp.asarray(1e-3))
        gs = GroupedBatchSolver(probs, caches, s)
        rng = np.random.default_rng(9)
        x0s = rng.uniform(-0.5, 0.5, size=(G, L, 4))
        xs, us, iters, solved = gs.solve_batch(x0s, method="fused")
        assert solved.sum() > 0
