"""Exact adaptive-rho cache rebuild (Settings.adaptive_rho_rebuild).

The reference's Taylor cache update (rho_benchmark.cpp:199-212) is measured
fatal beyond |drho| ~ 2 (docs/DESIGN.md §4).  The opt-in rebuild re-runs the
Riccati fixed point at the predicted rho on device instead — the batched
analog of re-calling tiny_precompute_and_set_cache (tiny_api.cpp:124-190) —
so adaptation works from an arbitrarily mis-set rho0.  Pins:

  * the rebuilt cache terms equal precompute_cache at the same rho;
  * with clipping pinning rho at rho0 the rebuild path reproduces the
    reference-exact Taylor path (exact iteration counts, ~1e-14 iterates);
  * value: from a deliberately mis-set rho0, adaptation-with-rebuild beats
    both fixed-rho0 and Taylor adaptation (the BENCH misset config's
    assertion, CPU-sized here).
"""
import numpy as np
import jax
import jax.numpy as jnp

from tinympc_julia_tpu import (Settings, init_state, make_problem,
                               precompute_cache)
from tinympc_julia_tpu.models import cartpole, quadrotor
from tinympc_julia_tpu.ops import rho as rho_mod
from tinympc_julia_tpu.parallel import broadcast_state, set_x0_batch
from tinympc_julia_tpu.parallel.batch import solve_batch


def _quad(rho0, dtype=jnp.float64, N=10):
    p = make_problem(jnp.asarray(quadrotor.A, dtype),
                     jnp.asarray(quadrotor.B, dtype),
                     jnp.asarray(np.diag(quadrotor.Q_DIAG), dtype),
                     jnp.asarray(np.diag(quadrotor.R_DIAG), dtype),
                     rho0, N, u_min=-0.5, u_max=0.5)
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(rho0, dtype))
    return p, c


def _cart_constrained(rho0, dtype=jnp.float64, N=20):
    """The reference's constrained-cartpole workload (cart position bounds
    active, examples/cartpole_example_reference_constrained.jl:16-18)."""
    xmax = np.array([2.0, 1e17, 1e17, 1e17])
    p = make_problem(jnp.asarray(cartpole.A, dtype),
                     jnp.asarray(cartpole.B, dtype),
                     jnp.asarray(np.diag(cartpole.Q_DIAG), dtype),
                     jnp.asarray(np.diag(cartpole.R_DIAG), dtype),
                     rho0, N, u_min=-5.0, u_max=5.0,
                     x_min=jnp.asarray(np.tile(-xmax, (N, 1)), dtype),
                     x_max=jnp.asarray(np.tile(xmax, (N, 1)), dtype))
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(rho0, dtype))
    return p, c


def _batch_state(p, B, seed, spread=0.3, scale=None):
    rng = np.random.default_rng(seed)
    x0s = rng.uniform(-spread, spread, size=(B, p.nx))
    if scale is not None:
        x0s = x0s * scale
    x0s = jnp.asarray(x0s, p.A.dtype)
    st = init_state(p.nx, p.nu, p.N, p.A.dtype)
    return set_x0_batch(broadcast_state(st, B), x0s)


class TestRebuildUpdate:
    def test_rebuild_matches_precompute_at_new_rho(self):
        """rebuild_update == precompute_cache evaluated at the new rho (same
        double-fold semantics, same cold-start fixed point)."""
        rho0, rho_new = 5.0, 17.0
        p, c = _quad(rho0)
        rebuilt = rho_mod.rebuild_update(c, p, rho_new, warm=False)
        # warm start (the solve-loop default) reaches the same fixed point
        # within the stopping tolerance
        warm = rho_mod.rebuild_update(c, p, rho_new, warm=True)
        np.testing.assert_allclose(np.asarray(warm.Kinf),
                                   np.asarray(rebuilt.Kinf),
                                   rtol=0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(warm.Pinf),
                                   np.asarray(rebuilt.Pinf),
                                   rtol=1e-4, atol=1e-6)

        Q_user = p.Q - p.rho_setup
        R_user = p.R - p.rho_setup
        ref = precompute_cache(p.A, p.B, Q_user + rho_new, R_user + rho_new,
                               jnp.asarray(rho_new, p.A.dtype),
                               compute_sensitivity=False)
        for field in ("Kinf", "Pinf", "Quu_inv", "AmBKt"):
            np.testing.assert_allclose(np.asarray(getattr(rebuilt, field)),
                                       np.asarray(getattr(ref, field)),
                                       rtol=0, atol=1e-12, err_msg=field)
        # C1/C2 track the fresh terms (self-consistent cache, no dead-write
        # quirk on the extension path)
        np.testing.assert_array_equal(np.asarray(rebuilt.C1),
                                      np.asarray(rebuilt.Quu_inv))
        np.testing.assert_array_equal(np.asarray(rebuilt.C2),
                                      np.asarray(rebuilt.AmBKt))
        # sensitivities untouched (setup-point constants, like the reference)
        np.testing.assert_array_equal(np.asarray(rebuilt.dKinf_drho),
                                      np.asarray(c.dKinf_drho))

    def test_rebuild_at_setup_rho_reproduces_setup_cache(self):
        p, c = _quad(5.0)
        rebuilt = rho_mod.rebuild_update(c, p, 5.0, warm=False)
        for field in ("Kinf", "Pinf", "Quu_inv", "AmBKt"):
            np.testing.assert_allclose(np.asarray(getattr(rebuilt, field)),
                                       np.asarray(getattr(c, field)),
                                       rtol=0, atol=1e-13, err_msg=field)


class TestRebuildSolvePath:
    def test_pinned_rho_matches_taylor_path(self):
        """With clipping pinning rho at rho0 the rebuild path reproduces the
        reference-exact Taylor path: the rebuilt terms at rho0 equal the
        setup cache bitwise (TestRebuildUpdate) and delta=0 Taylor is a
        no-op, so both branches iterate the same math.  Iteration counts
        and solved flags pin exactly; iterates to tight f64 tolerance —
        the lax.cond rebuild branch makes XLA compile a *different
        program* whose fusion choices round unrelated ops differently at
        the ~1e-14 level (measured; the caches themselves are bitwise
        equal)."""
        p, c = _quad(5.0)
        st = _batch_state(p, 8, seed=0)
        kw = dict(max_iter=60, en_state_bound=False, en_input_bound=True,
                  adaptive_rho=True, adaptive_rho_min=5.0,
                  adaptive_rho_max=5.0)
        _, ca_t, sol_t = solve_batch(p, c, Settings(**kw), st)
        _, ca_r, sol_r = solve_batch(
            p, c, Settings(adaptive_rho_rebuild=True, **kw), st)
        np.testing.assert_array_equal(np.asarray(sol_t.iter),
                                      np.asarray(sol_r.iter))
        np.testing.assert_array_equal(np.asarray(sol_t.solved),
                                      np.asarray(sol_r.solved))
        np.testing.assert_allclose(np.asarray(sol_t.u),
                                   np.asarray(sol_r.u), rtol=0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(sol_t.x),
                                   np.asarray(sol_r.x), rtol=0, atol=1e-12)
        np.testing.assert_array_equal(np.asarray(ca_t.rho),
                                      np.asarray(ca_r.rho))

    def test_misset_rho0_rebuild_beats_fixed_and_taylor(self):
        """The value demonstration (VERDICT r3 item 1): rho0 deliberately
        mis-set LOW on the constrained-cartpole workload (the direction
        where fixed-rho genuinely fails — measured iteration counts are
        flat for rho in [1, 1000] but blow up below ~0.1, docs/DESIGN.md
        §4).  The termination-residual controller raises rho; with the
        exact rebuild that is safe and the solve converges fast, while
        fixed-rho0 grinds/fails and Taylor extrapolation at +drho >> 2
        breaks down (the measured-fatal direction)."""
        rho0 = 0.01
        p, c = _cart_constrained(rho0)
        B = 16
        st = _batch_state(p, B, seed=1, spread=1.0,
                          scale=np.array([1.8, 1.0, 0.4, 0.5]))
        base = dict(max_iter=1000, en_state_bound=True, en_input_bound=True)
        adapt = dict(adaptive_rho=True,
                     adaptive_rho_controller="termination",
                     adaptive_rho_min=1e-4, adaptive_rho_max=1e4)

        _, _, sol_fixed = solve_batch(p, c, Settings(**base), st)
        _, ca_reb, sol_reb = solve_batch(
            p, c, Settings(adaptive_rho_rebuild=True, **adapt, **base), st)
        _, ca_tay, sol_tay = solve_batch(p, c, Settings(**adapt, **base), st)

        # rho actually moved (nontrivial span: raised well above rho0)
        assert float(jnp.max(ca_reb.rho)) > 50 * rho0
        n_fixed = int(jnp.sum(sol_fixed.solved))
        n_reb = int(jnp.sum(sol_reb.solved))
        n_tay = int(jnp.sum(sol_tay.solved))
        assert n_reb == B, f"rebuild should converge all lanes, got {n_reb}"
        assert n_fixed < B, "workload must be hard for fixed mis-set rho0"
        # Taylor at large +drho is the measured-fatal direction: the exact
        # rebuild must converge strictly more lanes
        assert n_reb > n_tay, (n_reb, n_tay)
        # and materially fewer iterations than fixed-rho0
        it_reb = float(jnp.mean(sol_reb.iter))
        it_fixed = float(jnp.mean(sol_fixed.iter))
        assert it_reb < 0.3 * it_fixed, (it_reb, it_fixed)

    def test_well_set_rho0_not_harmed(self):
        """At a well-chosen rho0 the termination controller's deadband keeps
        adaptation from hurting: same convergence, comparable iterations."""
        p, c = _cart_constrained(1.0)
        B = 16
        st = _batch_state(p, B, seed=1, spread=1.0,
                          scale=np.array([1.8, 1.0, 0.4, 0.5]))
        base = dict(max_iter=1000, en_state_bound=True, en_input_bound=True)
        _, _, sol_fixed = solve_batch(p, c, Settings(**base), st)
        _, _, sol_reb = solve_batch(
            p, c, Settings(adaptive_rho=True, adaptive_rho_rebuild=True,
                           adaptive_rho_controller="termination",
                           adaptive_rho_min=1e-4, adaptive_rho_max=1e4,
                           **base), st)
        assert int(jnp.sum(sol_reb.solved)) == int(jnp.sum(sol_fixed.solved))
        assert (float(jnp.mean(sol_reb.iter))
                <= 2.0 * float(jnp.mean(sol_fixed.iter)))
