"""The bucketed exact-rebuild adaptive-rho pipeline (parallel/rebuild.py).

Pins the throughput-viable form of the rebuild extension (VERDICT r4 item 1)
against the standard rebuild path (ops/rho.rebuild_update inside the solve
loop) on the mis-set-rho0 constrained cartpole:

  * solution QUALITY parity: per-lane error vs a tight-tolerance oracle is
    statistically equal to the standard rebuild path's (pairwise iterate
    comparison is not meaningful — two 1e-3-converged answers at different
    final rho are both valid);
  * convergence parity-or-better at far fewer iterations than fixed rho;
  * the per-bucket caches are bitwise what setup at that rho would build;
  * overflow accounting and tile-pad lane masking.
"""
import numpy as np
import jax
import jax.numpy as jnp

from tinympc_julia_tpu import (Settings, init_state, make_problem,
                               precompute_cache)
from tinympc_julia_tpu.models import cartpole
from tinympc_julia_tpu.parallel import broadcast_state, set_x0_batch
from tinympc_julia_tpu.parallel.batch import solve_batch
from tinympc_julia_tpu.parallel.rebuild import (default_bucket_rhos,
                                                make_bucketed_rebuild,
                                                rebuild_bucket_caches)

RHO0 = 0.01


def _misset_problem(B, seed=5):
    dtype = jnp.float32
    N = cartpole.HORIZON
    xmax = np.array([2.0, 1e17, 1e17, 1e17])
    p = make_problem(jnp.asarray(cartpole.A, dtype),
                     jnp.asarray(cartpole.B, dtype),
                     jnp.asarray(np.diag(cartpole.Q_DIAG), dtype),
                     jnp.asarray(np.diag(cartpole.R_DIAG), dtype),
                     RHO0, N, u_min=-5.0, u_max=5.0,
                     x_min=jnp.asarray(np.tile(-xmax, (N, 1)), dtype),
                     x_max=jnp.asarray(np.tile(xmax, (N, 1)), dtype))
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(RHO0, dtype))
    rng = np.random.default_rng(seed)
    x0s = jnp.asarray(rng.uniform(-1, 1, size=(B, 4))
                      * np.array([1.8, 1.0, 0.4, 0.5]), dtype)
    return p, c, x0s


class TestBucketCaches:
    def test_bucket_cache_equals_setup_at_that_rho(self):
        """Each bucket cache == precompute_cache of a problem set up at the
        bucket rho (the exact tiny_setup + tiny_precompute_and_set_cache
        semantics, tiny_api.cpp:21-190)."""
        p, c, _ = _misset_problem(4)
        rhos = (0.1, 1.0, 10.0)
        bc = rebuild_bucket_caches(p, c, rhos)
        for g, r in enumerate(rhos):
            r = jnp.asarray(r, p.A.dtype)
            # the folded diagonals setup at rho r would store
            Qf = p.Q - p.rho_setup + r
            Rf = p.R - p.rho_setup + r
            want = precompute_cache(p.A, p.B, Qf, Rf, r,
                                    compute_sensitivity=False)
            for field in ("Kinf", "Pinf", "Quu_inv", "AmBKt"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(bc, field))[g],
                    np.asarray(getattr(want, field)), err_msg=field)

    def test_default_buckets_span(self):
        rhos = default_bucket_rhos(1e-4, 1e4)
        assert rhos[0] == 1e-4 and abs(rhos[-1] - 1e4) < 1e-6
        # 2-decade spacing (quantization error <= 1 decade stays inside
        # the measured ~3-decade flat region; fewer buckets = fewer
        # phase-2 pad tiles)
        assert len(rhos) == 5
        assert len(default_bucket_rhos(1e-4, 1e4, per_decade=1.0)) == 9


class TestBucketedRebuild:
    def test_rescues_misset_rho_with_standard_quality(self):
        B = 64
        p, c, x0s = _misset_problem(B)
        st = set_x0_batch(
            broadcast_state(init_state(4, 1, cartpole.HORIZON,
                                       jnp.float32), B), x0s)
        base = dict(max_iter=500, en_state_bound=True, en_input_bound=True)

        # tight oracle (the QP's solution to 1e-6)
        s_tight = Settings(max_iter=3000, abs_pri_tol=1e-6,
                           abs_dua_tol=1e-6, en_state_bound=True,
                           en_input_bound=True, adaptive_rho=True,
                           adaptive_rho_controller="termination",
                           adaptive_rho_rebuild=True,
                           adaptive_rho_min=1e-4, adaptive_rho_max=1e4)
        _, _, sol_t = solve_batch(p, c, s_tight, st)
        u_star = np.asarray(sol_t.u)
        ok_t = np.asarray(sol_t.solved) == 1

        # controls: fixed rho + the standard rebuild path
        _, _, sol_fix = solve_batch(p, c, Settings(**base), st)
        s_reb = Settings(adaptive_rho=True,
                         adaptive_rho_controller="termination",
                         adaptive_rho_rebuild=True, adaptive_rho_min=1e-4,
                         adaptive_rho_max=1e4, **base)
        _, _, sol_reb = solve_batch(p, c, s_reb, st)

        s_bkt = Settings(max_iter=500, en_state_bound=True,
                         en_input_bound=True, adaptive_rho_min=1e-4,
                         adaptive_rho_max=1e4)
        pipe = make_bucketed_rebuild(p, c, s_bkt, phase1_iters=50,
                                     straggler_slots=B, phase2_iters=450,
                                     batch_tile=8)
        xs, us, iters, solved, rho, overflow = (
            np.asarray(o) for o in pipe.solve(x0s))

        n_fix = int(np.sum(np.asarray(sol_fix.solved)))
        n_reb = int(np.sum(np.asarray(sol_reb.solved)))
        # the capability: rescue mis-set rho0 (fixed control fails ~half)
        assert n_fix < 0.75 * B
        assert solved.sum() >= min(n_reb, int(0.95 * B))
        assert iters[solved == 1].mean() < \
            np.asarray(sol_fix.iter).mean() * 0.6
        # rho genuinely moved to a bucket above rho0 for the stragglers
        assert rho.max() >= 1.0 and (rho >= 1.0).sum() >= B // 3
        assert not overflow.any()

        # QUALITY parity vs the tight oracle: the bucketed solutions are
        # statistically as close to the true QP solution as the standard
        # rebuild path's (both converged at 1e-3, possibly at different
        # rho — pairwise comparison is not meaningful)
        mask = ok_t & (solved == 1) & (np.asarray(sol_reb.solved) == 1)
        assert mask.sum() >= B // 2
        e_bkt = np.abs(us - u_star).max(axis=(1, 2))[mask]
        e_reb = np.abs(np.asarray(sol_reb.u) - u_star).max(axis=(1, 2))[mask]
        assert np.median(e_bkt) <= 2 * max(np.median(e_reb), 1e-4)
        assert np.quantile(e_bkt, 0.9) <= \
            2 * max(np.quantile(e_reb, 0.9), 1e-3)

    def test_overflow_counts_and_phase1_state(self):
        """Lanes overflowing a bucket's slots keep their unconverged
        phase-1 state and are counted per bucket."""
        B = 32
        p, c, x0s = _misset_problem(B, seed=7)
        s = Settings(max_iter=500, en_state_bound=True, en_input_bound=True,
                     adaptive_rho_min=1e-4, adaptive_rho_max=1e4)
        pipe_small = make_bucketed_rebuild(p, c, s, phase1_iters=50,
                                           straggler_slots=8,
                                           phase2_iters=200, batch_tile=8)
        pipe_big = make_bucketed_rebuild(p, c, s, phase1_iters=50,
                                         straggler_slots=B,
                                         phase2_iters=200, batch_tile=8)
        xs_s, us_s, it_s, ok_s, rho_s, ov_s = (
            np.asarray(o) for o in pipe_small.solve(x0s))
        xs_b, us_b, it_b, ok_b, rho_b, ov_b = (
            np.asarray(o) for o in pipe_big.solve(x0s))
        assert not ov_b.any()
        assert ov_s.sum() > 0  # slots=8 genuinely overflow at B=32
        assert ok_b.sum() > ok_s.sum()
        # overflowed lanes: phase-1 state (iters == phase1 budget, rho0)
        overflowed = (it_s == 50) & (ok_s == 0)
        assert overflowed.sum() == ov_s.sum()
        np.testing.assert_allclose(rho_s[overflowed], RHO0, rtol=1e-6)

    def test_precision_staging_plumbing(self):
        """phase1_bf16 / phase2_bf16_iters wire through (on CPU DEFAULT
        precision == f32, so results match the unstaged pipeline; the bf16
        numerics are a chip-measured perf story, docs/DESIGN.md §5)."""
        B = 16
        p, c, x0s = _misset_problem(B, seed=13)
        s = Settings(max_iter=500, en_state_bound=True, en_input_bound=True,
                     adaptive_rho_min=1e-4, adaptive_rho_max=1e4)
        plain = make_bucketed_rebuild(p, c, s, phase1_iters=50,
                                      straggler_slots=B, phase2_iters=200,
                                      batch_tile=8)
        staged = make_bucketed_rebuild(p, c, s, phase1_iters=50,
                                       straggler_slots=B, phase2_iters=160,
                                       batch_tile=8, phase1_bf16=True,
                                       phase2_bf16_iters=40)
        out_a = [np.asarray(o) for o in plain.solve(x0s)]
        out_b = [np.asarray(o) for o in staged.solve(x0s)]
        np.testing.assert_array_equal(out_a[3], out_b[3])  # solved
        np.testing.assert_array_equal(out_a[2], out_b[2])  # iters
        np.testing.assert_allclose(out_a[1], out_b[1], atol=1e-6)

    def test_lane_mask_excludes_pad_lanes(self):
        B = 16
        p, c, x0s = _misset_problem(B, seed=9)
        s = Settings(max_iter=500, en_state_bound=True, en_input_bound=True,
                     adaptive_rho_min=1e-4, adaptive_rho_max=1e4)
        pipe = make_bucketed_rebuild(p, c, s, phase1_iters=50,
                                     straggler_slots=8, phase2_iters=200,
                                     batch_tile=8)
        mask = jnp.arange(B) < 8  # only the first 8 lanes are real
        out = pipe.solve(x0s, mask)
        it, ok, rho = (np.asarray(out[i]) for i in (2, 3, 4))
        # masked lanes never enter phase 2: phase-1 state only
        assert np.all(it[8:] <= 50)
        np.testing.assert_allclose(rho[8:], RHO0, rtol=1e-6)

    def test_api_entry_point(self):
        from tinympc_julia_tpu import TinyMPCSolver
        B = 24  # deliberately not a tile multiple (pads to 24 -> 8*3)
        p, c, x0s = _misset_problem(B, seed=11)
        solver = TinyMPCSolver(dtype=jnp.float32)
        xmax = np.array([2.0, 1e17, 1e17, 1e17])
        N = cartpole.HORIZON
        solver.setup(np.asarray(cartpole.A), np.asarray(cartpole.B), None,
                     np.diag(cartpole.Q_DIAG), np.diag(cartpole.R_DIAG),
                     RHO0, 4, 1, N, max_iter=500,
                     adaptive_rho_min=1e-4, adaptive_rho_max=1e4)
        solver.set_bound_constraints(
            np.tile(-xmax[:, None], (1, N)), np.tile(xmax[:, None], (1, N)),
            np.full((1, N - 1), -5.0), np.full((1, N - 1), 5.0))
        xs, us, iters, solved, rho = solver.solve_batch_rebuild_adaptive(
            np.asarray(x0s), phase1_iters=50, phase2_iters=450)
        assert xs.shape == (B, N, 4) and us.shape == (B, N - 1, 1)
        assert solved.sum() >= 0.9 * B
        assert rho.max() > RHO0
        assert solver.last_overflow is not None


class TestReviewRegressions:
    def test_setter_changes_invalidate_cached_pipeline(self):
        """The rebuild pipeline bakes problem data into its closure; the
        API keys the cache on a digest of everything baked, so constraint
        changes between calls rebuild instead of silently reusing stale
        bounds (r5 review finding)."""
        from tinympc_julia_tpu import TinyMPCSolver
        N = cartpole.HORIZON
        s = TinyMPCSolver(dtype=jnp.float32)
        s.setup(np.asarray(cartpole.A), np.asarray(cartpole.B), None,
                np.diag(cartpole.Q_DIAG), np.diag(cartpole.R_DIAG), RHO0,
                4, 1, N, max_iter=300,
                adaptive_rho_min=1e-4, adaptive_rho_max=1e4)
        xmax = np.array([2.0, 1e17, 1e17, 1e17])
        s.set_bound_constraints(
            np.tile(-xmax[:, None], (1, N)), np.tile(xmax[:, None], (1, N)),
            np.full((1, N - 1), -5.0), np.full((1, N - 1), 5.0))
        rng = np.random.default_rng(5)
        x0s = rng.uniform(-1, 1, size=(16, 4)) \
            * np.array([1.8, 1.0, 0.4, 0.5])
        _, us1, _, _, _ = s.solve_batch_rebuild_adaptive(
            x0s, phase1_iters=20, phase2_iters=100)
        s.set_bound_constraints(
            np.tile(-xmax[:, None], (1, N)), np.tile(xmax[:, None], (1, N)),
            np.full((1, N - 1), -2.0), np.full((1, N - 1), 2.0))
        _, us2, _, _, _ = s.solve_batch_rebuild_adaptive(
            x0s, phase1_iters=20, phase2_iters=100)
        assert np.abs(us1).max() > 2.0 + 1e-6  # old bound was active
        assert np.abs(us2).max() <= 2.0 + 1e-5  # new bound respected

    def test_update_settings_accepts_taylor_trust(self):
        from tinympc_julia_tpu import TinyMPCSolver
        s = TinyMPCSolver()
        s.setup(np.asarray(cartpole.A), np.asarray(cartpole.B), None,
                np.diag(cartpole.Q_DIAG), np.diag(cartpole.R_DIAG), 1.0,
                4, 1, cartpole.HORIZON)
        s.update_settings(adaptive_rho_taylor_trust=2.0)
        assert float(s.settings.adaptive_rho_taylor_trust) == 2.0

    def test_grouped_adaptive_validates_rho_interval(self):
        from tinympc_julia_tpu import (Settings as S, make_problem,
                                       precompute_cache)
        from tinympc_julia_tpu.parallel.grouped import (GroupedBatchSolver,
                                                        stack_instances)
        import pytest
        p, c, _ = _misset_problem(4)
        gs = GroupedBatchSolver(
            stack_instances([p, p]), stack_instances([c, c]),
            S(max_iter=52, check_termination=2, adaptive_rho=True,
              en_state_bound=True, en_input_bound=True))
        with pytest.raises(ValueError, match="lcm"):
            gs.solve_batch(np.zeros((2, 8, 4)), method="fused")
