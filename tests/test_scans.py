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
