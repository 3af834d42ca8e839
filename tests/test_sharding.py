"""Sharded solving over a virtual 8-device CPU mesh (SURVEY.md §4: multi-host
tests fake a mesh via xla_force_host_platform_device_count)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tinympc_julia_tpu import Settings, init_state, make_problem, precompute_cache
from tinympc_julia_tpu.models import cartpole, quadrotor
from tinympc_julia_tpu.parallel import (broadcast_state, make_mesh,
                                        set_x0_batch, shard_state,
                                        solve_batch, solve_sharded)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 2,
                                reason="needs multi-device mesh")


def _mk():
    p = make_problem(jnp.asarray(cartpole.A), jnp.asarray(cartpole.B),
                     jnp.asarray(np.diag(cartpole.Q_DIAG)),
                     jnp.asarray(np.diag(cartpole.R_DIAG)), 1.0, 20,
                     u_min=-0.7, u_max=0.7)
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(1.0, p.A.dtype))
    s = Settings(max_iter=100, en_state_bound=False, en_input_bound=True)
    return p, c, s


def _batch(p, B, seed=0):
    rng = np.random.default_rng(seed)
    x0s = jnp.asarray(rng.uniform(-0.6, 0.6, size=(B, 4)))
    st = set_x0_batch(broadcast_state(init_state(4, 1, 20, p.A.dtype), B), x0s)
    return st


class TestSharded:
    @pytest.mark.parametrize("vote", [True, False])
    def test_sharded_matches_local(self, vote):
        p, c, s = _mk()
        mesh = make_mesh()
        B = 8 * mesh.shape["batch"]
        st = _batch(p, B)
        st_sh = shard_state(st, mesh)
        _, _, sol_sh = solve_sharded(p, c, s, st_sh, mesh, vote=vote)
        _, _, sol_loc = solve_batch(p, c, s, st)
        np.testing.assert_allclose(np.asarray(sol_sh.x), np.asarray(sol_loc.x),
                                   atol=1e-12)
        np.testing.assert_array_equal(np.asarray(sol_sh.solved),
                                      np.asarray(sol_loc.solved))
        # Without a vote, devices exit independently, so per-instance iter
        # counts still match (frozen lanes); with a vote they also match.
        np.testing.assert_array_equal(np.asarray(sol_sh.iter),
                                      np.asarray(sol_loc.iter))

    def test_sharded_bitwise_f32(self):
        """f32 sharded == per-shard-shaped local solve, BITWISE.

        Regression for MULTICHIP_r02: the sharded f32 result differed from
        the full-batch local f32 result by ~2e-6 — pure XLA reassociation
        (batch B vs batch B/n compile different matmul orderings), not a
        sharding bug. The sharding machinery itself (shard_map + psum vote)
        must add exactly zero numerical effect, which this pins at the ulp
        level by comparing against local solves at the per-shard batch shape.
        """
        p, c, s = _mk()
        p32 = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float32), p)
        c32 = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float32), c)
        mesh = make_mesh()
        n_dev = mesh.shape["batch"]
        B = 2 * n_dev
        rng = np.random.default_rng(7)
        x0s = jnp.asarray(rng.uniform(-0.6, 0.6, size=(B, 4)), jnp.float32)
        st = set_x0_batch(
            broadcast_state(init_state(4, 1, 20, jnp.float32), B), x0s)
        st_sh = shard_state(st, mesh)
        _, _, sol_sh = solve_sharded(p32, c32, s, st_sh, mesh, vote=True)
        per = B // n_dev
        for i in range(n_dev):
            sl = jax.tree_util.tree_map(lambda a: a[i * per:(i + 1) * per], st)
            _, _, r = solve_batch(p32, c32, s, sl)
            np.testing.assert_array_equal(
                np.asarray(sol_sh.u)[i * per:(i + 1) * per], np.asarray(r.u))
            np.testing.assert_array_equal(
                np.asarray(sol_sh.iter)[i * per:(i + 1) * per],
                np.asarray(r.iter))

    def test_sharded_output_sharding(self):
        p, c, s = _mk()
        mesh = make_mesh()
        B = 4 * mesh.shape["batch"]
        st = shard_state(_batch(p, B), mesh)
        out_st, _, sol = solve_sharded(p, c, s, st, mesh)
        # outputs stay sharded over the batch axis (no implicit gather)
        assert len(sol.x.sharding.device_set) == mesh.shape["batch"]
        assert len(out_st.x.sharding.device_set) == mesh.shape["batch"]

    def test_sharded_adaptive_rho(self):
        p, c, _ = _mk()
        s = Settings(max_iter=100, en_input_bound=True, en_state_bound=False,
                     adaptive_rho=True, adaptive_rho_min=0.5,
                     adaptive_rho_max=5.0)
        mesh = make_mesh()
        B = 2 * mesh.shape["batch"]
        st = shard_state(_batch(p, B, seed=9), mesh)
        _, cache_out, sol = solve_sharded(p, c, s, st, mesh)
        rhos = np.asarray(cache_out.rho)
        assert rhos.shape == (B,)
        _, cache_loc, sol_loc = solve_batch(p, c, s, _batch(p, B, seed=9))
        np.testing.assert_allclose(rhos, np.asarray(cache_loc.rho), atol=1e-12)

    def test_indivisible_batch_raises(self):
        p, c, s = _mk()
        mesh = make_mesh()
        if mesh.shape["batch"] == 1:
            pytest.skip("single device")
        st = _batch(p, mesh.shape["batch"] + 1)
        with pytest.raises(ValueError, match="not divisible"):
            solve_sharded(p, c, s, st, mesh)

    def test_quadrotor_sharded(self):
        """The flagship 12-state model sharded over the full mesh."""
        p = make_problem(jnp.asarray(quadrotor.A), jnp.asarray(quadrotor.B),
                         jnp.asarray(np.diag(quadrotor.Q_DIAG)),
                         jnp.asarray(np.diag(quadrotor.R_DIAG)), 5.0, 20,
                         u_min=-0.5, u_max=0.5)
        c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(5.0, p.A.dtype))
        s = Settings(max_iter=300, en_state_bound=False, en_input_bound=True)
        mesh = make_mesh()
        B = 2 * mesh.shape["batch"]
        rng = np.random.default_rng(2)
        x0s = jnp.asarray(rng.uniform(-0.3, 0.3, size=(B, 12)))
        st = set_x0_batch(
            broadcast_state(init_state(12, 4, 20, p.A.dtype), B), x0s)
        st = shard_state(st, mesh)
        _, _, sol = solve_sharded(p, c, s, st, mesh)
        assert np.all(np.asarray(sol.solved) == 1)
        assert np.all(np.abs(np.asarray(sol.u)) <= 0.5 + 1e-9)
