"""Associative-scan horizon recursions vs the sequential reference path
(SURVEY.md §5.7: the sequence-parallel slot)."""
import numpy as np
import jax.numpy as jnp

from tinympc_julia_tpu import init_state
from tinympc_julia_tpu.ops import admm, scans
from tinympc_julia_tpu.models import cartpole, quadrotor
from tinympc_julia_tpu import make_problem, precompute_cache


def _setup(model, N=20, seed=0):
    rng = np.random.default_rng(seed)
    p = make_problem(jnp.asarray(model.A), jnp.asarray(model.B),
                     jnp.asarray(np.diag(model.Q_DIAG)),
                     jnp.asarray(np.diag(model.R_DIAG)), model.RHO, N)
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(model.RHO, p.A.dtype))
    st = init_state(model.NX, model.NU, N, p.A.dtype)
    st = st.replace(
        x=st.x.at[0].set(jnp.asarray(rng.normal(size=model.NX))),
        d=jnp.asarray(rng.normal(size=(N - 1, model.NU))),
        p=jnp.asarray(rng.normal(size=(N, model.NX))),
        q=jnp.asarray(rng.normal(size=(N, model.NX))),
        r=jnp.asarray(rng.normal(size=(N - 1, model.NU))))
    return p, c, st


class TestAssocScans:
    def test_forward_matches_sequential(self):
        for model in (cartpole, quadrotor):
            p, c, st = _setup(model)
            seq = admm.forward_pass(st, p, c)
            par = scans.forward_pass_assoc(st, p, c)
            np.testing.assert_allclose(np.asarray(par.x), np.asarray(seq.x),
                                       rtol=1e-10, atol=1e-10)
            np.testing.assert_allclose(np.asarray(par.u), np.asarray(seq.u),
                                       rtol=1e-10, atol=1e-10)

    def test_backward_matches_sequential(self):
        for model in (cartpole, quadrotor):
            p, c, st = _setup(model)
            seq = admm.backward_pass(st, p, c)
            par = scans.backward_pass_assoc(st, p, c)
            np.testing.assert_allclose(np.asarray(par.p), np.asarray(seq.p),
                                       rtol=1e-9, atol=1e-10)
            np.testing.assert_allclose(np.asarray(par.d), np.asarray(seq.d),
                                       rtol=1e-9, atol=1e-10)

    def test_long_horizon_stability(self):
        """N=512: the affine scan must stay finite and match sequential (the
        closed-loop matrix A - B Kinf is stable, so powers contract)."""
        p, c, st = _setup(cartpole, N=512)
        seq = admm.forward_pass(st, p, c)
        par = scans.forward_pass_assoc(st, p, c)
        assert np.all(np.isfinite(np.asarray(par.x)))
        np.testing.assert_allclose(np.asarray(par.x), np.asarray(seq.x),
                                   rtol=1e-8, atol=1e-8)

    def test_full_solve_horizon_parallel(self):
        """End-to-end solve with horizon_parallel=True converges to the same
        solution as the sequential path."""
        from tinympc_julia_tpu.models import cartpole as cp
        s1 = cp.make_solver(max_iter=100)
        s2 = cp.make_solver(max_iter=100)
        s2.horizon_parallel = True
        for s in (s1, s2):
            s.set_x0([0.5, 0.0, 0.0, 0.0])
            s.solve()
        np.testing.assert_allclose(s2.get_solution().controls,
                                   s1.get_solution().controls,
                                   rtol=1e-8, atol=1e-8)
        assert int(s1.solution.iter) == int(s2.solution.iter)


class TestChunkedScans:
    """Chunked condensation (build_chunk_maps): the long-horizon fast path —
    one reusable C-stage chunk map, lax.scan over N/C chunks."""

    def test_forward_matches_sequential(self):
        for model, C in ((cartpole, 4), (quadrotor, 5)):
            p, c, st = _setup(model, N=21)
            cm = scans.build_chunk_maps(p, c, C)
            seq = admm.forward_pass(st, p, c)
            chk = scans.forward_pass_chunked(st, p, c, cm)
            np.testing.assert_allclose(np.asarray(chk.x), np.asarray(seq.x),
                                       rtol=1e-10, atol=1e-10)
            np.testing.assert_allclose(np.asarray(chk.u), np.asarray(seq.u),
                                       rtol=1e-10, atol=1e-10)

    def test_backward_matches_sequential(self):
        for model, C in ((cartpole, 4), (quadrotor, 5)):
            p, c, st = _setup(model, N=21)
            cm = scans.build_chunk_maps(p, c, C)
            seq = admm.backward_pass(st, p, c)
            chk = scans.backward_pass_chunked(st, p, c, cm)
            np.testing.assert_allclose(np.asarray(chk.p), np.asarray(seq.p),
                                       rtol=1e-9, atol=1e-10)
            np.testing.assert_allclose(np.asarray(chk.d), np.asarray(seq.d),
                                       rtol=1e-9, atol=1e-10)

    def test_affine_term_rides_chunk_map(self):
        """The affine dynamics term f enters T1c's constant column."""
        from tinympc_julia_tpu.models import rocket
        p, c, st = _setup(rocket, N=11)
        p = p.replace(f=jnp.asarray(np.asarray(rocket.F), p.A.dtype))
        cm = scans.build_chunk_maps(p, c, 5)
        seq = admm.forward_pass(st, p, c)
        chk = scans.forward_pass_chunked(st, p, c, cm)
        np.testing.assert_allclose(np.asarray(chk.x), np.asarray(seq.x),
                                   rtol=1e-10, atol=1e-10)

    def test_full_batched_solve_matches_sequential(self):
        """End-to-end batched solve with chunk_maps == the sequential path
        (same iteration counts; iterates at reassociation level)."""
        from tinympc_julia_tpu.parallel import batch as batch_mod
        from tinympc_julia_tpu import Settings, init_state
        rng = np.random.default_rng(7)
        p, c, _ = _setup(cartpole, N=65)
        cm = scans.build_chunk_maps(p, c, 16)
        B = 8
        x0s = jnp.asarray(rng.uniform(-0.5, 0.5, size=(B, 4)))
        st = batch_mod.set_x0_batch(
            batch_mod.broadcast_state(init_state(4, 1, 65, p.A.dtype), B),
            x0s)
        s = Settings(max_iter=100, en_state_bound=False, en_input_bound=True)
        p2 = p.replace(u_min=jnp.full_like(p.u_min, -5.0),
                       u_max=jnp.full_like(p.u_max, 5.0))
        _, _, sol_seq = batch_mod.solve_batch(p2, c, s, st)
        _, _, sol_chk = batch_mod.solve_batch(p2, c, s, st, chunk_maps=cm)
        np.testing.assert_array_equal(np.asarray(sol_seq.iter),
                                      np.asarray(sol_chk.iter))
        np.testing.assert_array_equal(np.asarray(sol_seq.solved),
                                      np.asarray(sol_chk.solved))
        np.testing.assert_allclose(np.asarray(sol_chk.u),
                                   np.asarray(sol_seq.u),
                                   rtol=1e-7, atol=1e-9)
        assert int(np.asarray(sol_seq.solved).sum()) > 0

    def test_auto_chunk_size(self):
        from tinympc_julia_tpu.ops.condensed import auto_chunk_size
        C = auto_chunk_size(4, 1, 2049)   # N-1 = 2048
        assert C is not None and (2049 - 1) % C == 0
        assert 64 <= C <= 256
        # prime N-1 leaves no divisor
        assert auto_chunk_size(4, 1, 2048) in (None, 89)  # 2047 = 23*89

    def test_api_auto_dispatches_chunked(self):
        """Long horizon beyond the condensed budget: method='auto' routes to
        the chunked path and solves."""
        from tinympc_julia_tpu import TinyMPCSolver
        from tinympc_julia_tpu.ops.condensed import (auto_chunk_size,
                                                     auto_uses_condensed)
        N = 1537   # N-1 = 1536 = 2^9 * 3; condensed footprint > 256 MB
        assert not auto_uses_condensed(4, 1, N)
        assert auto_chunk_size(4, 1, N) is not None
        s = TinyMPCSolver(dtype=jnp.float32)
        s.setup(np.asarray(cartpole.A), np.asarray(cartpole.B), None,
                np.diag(cartpole.Q_DIAG), np.diag(cartpole.R_DIAG), 1.0,
                4, 1, N, max_iter=25)
        rng = np.random.default_rng(8)
        xs, us, iters, solved = s.solve_batch(
            rng.uniform(-0.2, 0.2, size=(4, 4)), method="auto")
        assert xs.shape == (4, N, 4)
        assert np.all(np.isfinite(us))
        # the explicit chunked method takes the same path
        xs2, us2, it2, sv2 = s.solve_batch(np.asarray(xs[:, 0]),
                                           method="chunked")
        np.testing.assert_array_equal(iters, it2)
        np.testing.assert_array_equal(us, us2)

    def test_api_single_solve_auto_chunked(self):
        """TinyMPCSolver.solve() automatically rides the chunked recursions
        at long horizons (beyond the condensed budget)."""
        from tinympc_julia_tpu import TinyMPCSolver
        N = 1537
        s = TinyMPCSolver(dtype=jnp.float32)
        s.setup(np.asarray(cartpole.A), np.asarray(cartpole.B), None,
                np.diag(cartpole.Q_DIAG), np.diag(cartpole.R_DIAG), 1.0,
                4, 1, N, max_iter=20)
        s.set_x0([0.3, 0.0, 0.05, 0.0])
        s.solve()
        assert s._chunk_maps is not None  # chunked path engaged
        sol = s.get_solution()
        assert sol.states.shape == (4, N)
        assert np.all(np.isfinite(sol.controls))
