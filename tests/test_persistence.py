"""Checkpoint/resume + AOT export tests (SURVEY.md §5.4)."""
import os

import numpy as np
import pytest

from tinympc_julia_tpu import TinyMPCSolver
from tinympc_julia_tpu.models import cartpole, rocket


class TestCheckpoint:
    def test_roundtrip_mid_loop(self, tmp_path):
        """Save mid-closed-loop, reload, continue: the resumed solver must
        produce identical controls (warm-start state preserved)."""
        s = cartpole.make_solver(max_iter=100, constrained=True)
        x = np.array([0.0, 0.0, 0.1, 0.0])
        for _ in range(10):
            s.set_x0(x)
            s.solve()
            u = s.get_solution().controls[:, 0]
            x = cartpole.simulate(x, u)

        path = os.path.join(str(tmp_path), "ckpt.npz")
        s.save(path)
        s2 = TinyMPCSolver.load(path)

        for _ in range(10):
            for sv in (s, s2):
                sv.set_x0(x)
                sv.solve()
            u1 = s.get_solution().controls
            u2 = s2.get_solution().controls
            np.testing.assert_allclose(u2, u1, atol=0)
            assert int(s.solution.iter) == int(s2.solution.iter)
            x = cartpole.simulate(x, u1[:, 0])

    def test_roundtrip_with_constraints(self, tmp_path):
        """Cones + linear constraints survive the roundtrip (static metadata)."""
        s = rocket.make_solver()
        s.set_linear_constraints(np.array([[1.0, 0, 0, 0, 0, 0]]),
                                 np.array([5.0]),
                                 np.zeros((0, 3)), np.zeros(0))
        s.set_x0(rocket.X_INIT)
        path = os.path.join(str(tmp_path), "rocket.npz")
        s.save(path)
        s2 = TinyMPCSolver.load(path)
        assert s2.problem.cones_u.starts == (0,)
        assert s2.problem.cones_u.dims == (3,)
        assert s2.settings.en_input_soc
        assert s2.settings.en_state_linear
        s.solve()
        s2.solve()
        np.testing.assert_allclose(s2.get_solution().controls,
                                   s.get_solution().controls, atol=0)

    def test_unsetup_save_raises(self, tmp_path):
        s = TinyMPCSolver()
        with pytest.raises(RuntimeError):
            s.save(os.path.join(str(tmp_path), "x.npz"))


class TestExport:
    def test_export_and_call(self):
        """Round-trip an AOT-exported solve through serialize/deserialize."""
        import jax.numpy as jnp
        from tinympc_julia_tpu import (Settings, init_state, make_problem,
                                       precompute_cache)
        from tinympc_julia_tpu.utils import export as ex

        p = make_problem(jnp.asarray(cartpole.A), jnp.asarray(cartpole.B),
                         jnp.asarray(np.diag(cartpole.Q_DIAG)),
                         jnp.asarray(np.diag(cartpole.R_DIAG)), 1.0, 20)
        c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(1.0, p.A.dtype))
        s = Settings(max_iter=50, en_state_bound=False, en_input_bound=False)
        st = init_state(4, 1, 20, p.A.dtype)
        st = st.replace(x=st.x.at[0].set(jnp.asarray([0.5, 0.0, 0.0, 0.0])))

        blob = ex.export_solve(p, c, s, st)
        assert isinstance(blob, (bytes, bytearray)) and len(blob) > 0

        fn = ex.load_solve(bytes(blob))
        out_state, out_cache, sol = fn(p, c, st)
        from tinympc_julia_tpu.ops import admm
        _, _, sol_ref = admm.solve(p, c, s, st)
        np.testing.assert_allclose(np.asarray(sol.u), np.asarray(sol_ref.u),
                                   atol=1e-12)
        assert int(sol.iter) == int(sol_ref.iter)
