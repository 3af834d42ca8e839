"""Batched-solve correctness: per-instance parity with sequential solves,
masked freezing on convergence, and batched adaptive-rho."""
import numpy as np
import jax
import jax.numpy as jnp

from tinympc_julia_tpu import (Settings, init_state, make_problem,
                               precompute_cache)
from tinympc_julia_tpu.models import cartpole
from tinympc_julia_tpu.parallel import (broadcast_state, set_x0_batch,
                                        solve_batch, solve_vmap)
from tinympc_julia_tpu.ops import admm


def _mk(settings=None, N=20):
    p = make_problem(jnp.asarray(cartpole.A), jnp.asarray(cartpole.B),
                     jnp.asarray(np.diag(cartpole.Q_DIAG)),
                     jnp.asarray(np.diag(cartpole.R_DIAG)), 1.0, N,
                     u_min=-0.7, u_max=0.7)
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(1.0, p.A.dtype))
    s = settings or Settings(max_iter=100, en_state_bound=False,
                             en_input_bound=True)
    return p, c, s


def _x0s(B, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-0.6, 0.6, size=(B, 4)))


class TestBatch:
    def test_batch_matches_sequential(self):
        """Every instance of the batched solve must equal its one-at-a-time
        solve bit-for-bit(-tolerance), including iteration counts — the
        freezing-mask analog of the reference's early return."""
        p, c, s = _mk()
        B = 7
        x0s = _x0s(B)
        st_b = set_x0_batch(broadcast_state(init_state(4, 1, 20, p.A.dtype), B),
                            x0s)
        stb, _, solb = solve_batch(p, c, s, st_b)

        for i in range(B):
            st = init_state(4, 1, 20, p.A.dtype)
            st = st.replace(x=st.x.at[0].set(x0s[i]))
            st1, _, sol1 = admm.solve(p, c, s, st)
            assert int(solb.iter[i]) == int(sol1.iter), f"instance {i}"
            assert int(solb.solved[i]) == int(sol1.solved)
            np.testing.assert_allclose(np.asarray(solb.x[i]),
                                       np.asarray(sol1.x), atol=1e-12)
            np.testing.assert_allclose(np.asarray(solb.u[i]),
                                       np.asarray(sol1.u), atol=1e-12)
            # full workspace parity (warm-start state preserved per instance)
            np.testing.assert_allclose(np.asarray(stb.y[i]),
                                       np.asarray(st1.y), atol=1e-12)

    def test_vmap_variant_matches(self):
        p, c, s = _mk()
        B = 5
        x0s = _x0s(B, seed=3)
        st_b = set_x0_batch(broadcast_state(init_state(4, 1, 20, p.A.dtype), B),
                            x0s)
        _, _, sol_a = solve_batch(p, c, s, st_b)
        _, _, sol_b = solve_vmap(p, c, s, st_b)
        np.testing.assert_allclose(np.asarray(sol_a.x), np.asarray(sol_b.x),
                                   atol=1e-12)
        np.testing.assert_array_equal(np.asarray(sol_a.iter),
                                      np.asarray(sol_b.iter))

    def test_mixed_convergence_iterations(self):
        """Instances with different difficulty converge at different iteration
        counts within one batched call."""
        p, c, s = _mk()
        x0s = jnp.asarray([[0.01, 0.0, 0.0, 0.0], [1.5, -0.8, 0.4, 0.9]])
        st_b = set_x0_batch(broadcast_state(init_state(4, 1, 20, p.A.dtype), 2),
                            x0s)
        _, _, sol = solve_batch(p, c, s, st_b)
        assert int(sol.iter[0]) < int(sol.iter[1])
        assert int(sol.solved[0]) == 1

    def test_batched_problems(self):
        """Per-instance problem data (here: different bounds)."""
        p, c, s = _mk()
        B = 3
        bounds = jnp.asarray([0.3, 0.6, 5.0])[:, None, None]
        p_b = jax.vmap(lambda lim: p.replace(
            u_min=jnp.broadcast_to(-lim, p.u_min.shape),
            u_max=jnp.broadcast_to(lim, p.u_max.shape)))(
                jnp.asarray([0.3, 0.6, 5.0]))
        x0s = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.2, 0.0]), (B, 4))
        st_b = set_x0_batch(broadcast_state(init_state(4, 1, 20, p.A.dtype), B),
                            x0s)
        _, _, sol = solve_batch(p_b, c, s, st_b, problem_batched=True)
        u = np.asarray(sol.u)
        assert np.max(np.abs(u[0])) <= 0.3 + 1e-9
        assert np.max(np.abs(u[1])) <= 0.6 + 1e-9
        assert np.max(np.abs(u[2])) > 0.6  # loosest bound actually used

    def test_batched_adaptive_rho(self):
        """Adaptive-rho with per-instance rho trajectories in one batch."""
        p, c, _ = _mk()
        s = Settings(max_iter=100, en_input_bound=True, en_state_bound=False,
                     adaptive_rho=True, adaptive_rho_min=0.5,
                     adaptive_rho_max=5.0)
        B = 4
        x0s = _x0s(B, seed=5)
        st_b = set_x0_batch(broadcast_state(init_state(4, 1, 20, p.A.dtype), B),
                            x0s)
        _, cache_b, sol = solve_batch(p, c, s, st_b)
        rhos = np.asarray(cache_b.rho)
        assert rhos.shape == (B,)
        assert np.all(rhos >= 0.5) and np.all(rhos <= 5.0)
        # per-instance parity with single adaptive solves
        for i in range(B):
            st = init_state(4, 1, 20, p.A.dtype)
            st = st.replace(x=st.x.at[0].set(x0s[i]))
            _, c1, sol1 = admm.solve(p, c, s, st)
            np.testing.assert_allclose(rhos[i], float(c1.rho), atol=1e-12)
            np.testing.assert_allclose(np.asarray(sol.u[i]),
                                       np.asarray(sol1.u), atol=1e-12)
