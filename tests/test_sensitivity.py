"""Sensitivity behavior mirroring /root/reference/tests/test_sensitivity.jl,
plus exactness checks the reference cannot do (jacfwd vs finite differences)."""
import numpy as np
import pytest

from tinympc_julia_tpu import compute_sensitivity_fd, precompute_cache
from tinympc_julia_tpu.models import cartpole, quadrotor
import jax.numpy as jnp


def test_shapes_and_finiteness():
    # test_sensitivity.jl:18-37
    s = cartpole.make_solver()
    dK, dP, dC1, dC2 = s.compute_sensitivity_autograd()
    assert dK.shape == (1, 4)
    assert dP.shape == (4, 4)
    assert dC1.shape == (1, 1)
    assert dC2.shape == (4, 4)
    for m in (dK, dP, dC1, dC2):
        assert np.all(np.isfinite(m))


def test_determinism():
    # test_sensitivity.jl:55-69
    s = cartpole.make_solver()
    a = s.compute_sensitivity_autograd()
    b = s.compute_sensitivity_autograd()
    for ma, mb in zip(a, b):
        np.testing.assert_allclose(ma, mb)


def test_rho_dependence():
    # test_sensitivity.jl:71-85: rho=0.5 vs rho=2.0 give different results.
    s1 = cartpole.make_solver()
    s1._user["rho"] = 0.5
    s2 = cartpole.make_solver()
    s2._user["rho"] = 2.0
    a = s1.compute_sensitivity_autograd()
    b = s2.compute_sensitivity_autograd()
    assert any(np.max(np.abs(ma - mb)) > 1e-8 for ma, mb in zip(a, b))


def test_jacfwd_matches_finite_differences():
    """Exact autodiff must agree with the Julia-recipe finite differences."""
    A, B = cartpole.A, cartpole.B
    Q, R = np.diag(cartpole.Q_DIAG), np.diag(cartpole.R_DIAG)
    s = cartpole.make_solver()
    exact = s.compute_sensitivity_autograd()
    fd = compute_sensitivity_fd(jnp.asarray(A), jnp.asarray(B),
                                jnp.asarray(Q), jnp.asarray(R), 1.0)
    for e, f in zip(exact, fd):
        np.testing.assert_allclose(np.asarray(e), np.asarray(f),
                                   rtol=1e-3, atol=1e-5)


def test_cache_sensitivities_match_numpy_fd():
    """The cache-path sensitivities (double-rho-fold semantics) must match an
    independent numpy finite-difference oracle — same recipe as
    tools/make_golden.py."""
    A, B = quadrotor.A, quadrotor.B
    Qd, Rd = quadrotor.Q_DIAG, quadrotor.R_DIAG
    rho, h = 5.0, 1e-6

    def numpy_terms(r):
        Q1 = np.diag(Qd + 2.0 * r)
        R1 = np.diag(Rd + 2.0 * r)
        Ktp1 = np.zeros((4, 12))
        Ptp1 = r * np.eye(12)
        Kinf, Pinf = Ktp1, Ptp1
        for _ in range(1000):
            Kinf = np.linalg.inv(R1 + B.T @ Ptp1 @ B) @ (B.T @ Ptp1 @ A)
            Pinf = Q1 + A.T @ Ptp1 @ (A - B @ Kinf)
            if np.max(np.abs(Kinf - Ktp1)) < 1e-5:
                break
            Ktp1, Ptp1 = Kinf, Pinf
        return (Kinf, Pinf, np.linalg.inv(R1 + B.T @ Pinf @ B),
                (A - B @ Kinf).T)

    t0, t1 = numpy_terms(rho), numpy_terms(rho + h)
    fd = [(m1 - m0) / h for m0, m1 in zip(t0, t1)]

    cache = precompute_cache(jnp.asarray(A), jnp.asarray(B),
                             jnp.asarray(Qd) + rho, jnp.asarray(Rd) + rho,
                             rho)
    exact = [cache.dKinf_drho, cache.dPinf_drho, cache.dC1_drho,
             cache.dC2_drho]
    for e, f in zip(exact, fd):
        np.testing.assert_allclose(np.asarray(e), f, rtol=2e-3, atol=2e-4)
