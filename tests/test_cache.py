"""Cache-injection behavior mirroring /root/reference/tests/test_cache.jl."""
import numpy as np

from tinympc_julia_tpu import solve_lqr
from tinympc_julia_tpu.models import cartpole


def test_set_cache_terms_accepts_matrices():
    # test_cache.jl:18-31
    rng = np.random.default_rng(0)
    s = cartpole.make_solver()
    K = rng.normal(size=(1, 4))
    P = rng.normal(size=(4, 4))
    C1 = rng.normal(size=(1, 1))
    C2 = rng.normal(size=(4, 4))
    assert s.set_cache_terms(K, P, C1, C2) == 0
    np.testing.assert_allclose(np.asarray(s.cache.Kinf), K)
    np.testing.assert_allclose(np.asarray(s.cache.AmBKt), C2)


def test_set_cache_terms_from_lqr():
    # test_cache.jl:33-50: accepts solve_lqr output; shapes/finiteness.
    s = cartpole.make_solver()
    K, P, C1, C2 = solve_lqr(cartpole.A, cartpole.B,
                             np.diag(cartpole.Q_DIAG),
                             np.diag(cartpole.R_DIAG), 1.0)
    assert K.shape == (1, 4) and P.shape == (4, 4)
    assert C1.shape == (1, 1) and C2.shape == (4, 4)
    assert all(np.all(np.isfinite(np.asarray(m))) for m in (K, P, C1, C2))
    assert s.set_cache_terms(np.asarray(K), np.asarray(P), np.asarray(C1),
                             np.asarray(C2)) == 0
    s.set_x0([0.3, 0.0, 0.0, 0.0])
    assert s.solve() in (0, 1)
