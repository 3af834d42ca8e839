"""Warm starts through the public batched API (VERDICT r3 item 5).

solve_batch(return_carry=True) returns an opaque BatchWarmCarry; passing it
back as warm= continues the solve.  On the condensed/fused paths this is an
EXACT continuation (two chained calls == one long solve lane-for-lane); on
the standard path it is the reference's persistent-workspace semantics
(SURVEY.md §5.4, examples/cartpole_example_mpc.jl:35-51).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tinympc_julia_tpu import TinyMPCSolver
from tinympc_julia_tpu.api import BatchWarmCarry
from tinympc_julia_tpu.models import cartpole


def _solver(max_iter, **kw):
    s = TinyMPCSolver(dtype=jnp.float32)
    s.setup(np.asarray(cartpole.A), np.asarray(cartpole.B), None,
            np.diag(cartpole.Q_DIAG), np.diag(cartpole.R_DIAG), 1.0,
            4, 1, 20, max_iter=max_iter, **kw)
    s.set_bound_constraints(np.full((4, 20), -1e17), np.full((4, 20), 1e17),
                            np.full((1, 19), -5.0), np.full((1, 19), 5.0))
    s.update_settings(en_state_bound=False)
    return s


def _x0s(B=24):
    rng = np.random.default_rng(0)
    # wide x0s so some lanes straggle past the phase-1 budget
    return rng.uniform(-0.9, 0.9, size=(B, 4))


class TestApiWarmChaining:
    @pytest.mark.parametrize("method", ["condensed", "fused"])
    def test_chained_equals_one_long_solve(self, method):
        """Two chained solve_batch calls == one long solve, lane-for-lane
        (the fast paths' exact-continuation contract at the API surface)."""
        x0s = _x0s()
        long = _solver(120)
        xs1, us1, it1, sv1 = long.solve_batch(x0s, method=method)

        short = _solver(40)
        out = short.solve_batch(x0s, method=method, return_carry=True)
        xs_a, us_a, it_a, sv_a, carry = out
        assert isinstance(carry, BatchWarmCarry)
        assert (sv_a == 0).any(), "phase 1 must leave stragglers"
        short.update_settings(max_iter=80)
        xs_b, us_b, it_b, sv_b = short.solve_batch(x0s, method=method,
                                                   warm=carry)

        # converged-in-phase-1 lanes: phase-1 verdicts already match
        m1 = np.asarray(sv_a) == 1
        np.testing.assert_array_equal(it1[m1], it_a[m1])
        np.testing.assert_array_equal(us1[m1], us_a[m1])
        # straggler lanes: the continuation reproduces the long solve
        m2 = ~m1
        np.testing.assert_array_equal(sv_b[m2], sv1[m2])
        np.testing.assert_array_equal(it_b[m2] + 40, it1[m2])
        np.testing.assert_array_equal(us_b[m2], us1[m2])
        np.testing.assert_array_equal(xs_b[m2], xs1[m2])

    def test_standard_warm_carries_workspace(self):
        """Standard path: warm = persistent-workspace semantics — a warm
        re-solve from the same x0 converges at least as fast as cold
        (the reference MPC-loop pattern)."""
        x0s = _x0s()
        s = _solver(100)
        _, _, it_cold, sv_cold, carry = s.solve_batch(
            x0s, method="standard", return_carry=True)
        _, _, it_warm, sv_warm = s.solve_batch(x0s, method="standard",
                                               warm=carry)
        assert isinstance(carry, BatchWarmCarry)
        assert (np.asarray(it_warm) <= np.asarray(it_cold)).all()
        assert np.asarray(sv_warm).sum() >= np.asarray(sv_cold).sum()

    def test_carry_validation(self):
        x0s = _x0s()
        s = _solver(40)
        *_, carry = s.solve_batch(x0s, method="condensed", return_carry=True)
        with pytest.raises(ValueError, match="method"):
            s.solve_batch(x0s, method="standard", warm=carry)
        with pytest.raises(ValueError, match="lanes"):
            s.solve_batch(x0s[:8], method="condensed", warm=carry)
        with pytest.raises(TypeError):
            s.solve_batch(x0s, method="condensed", warm=object())

    def test_adaptive_condensed_chained(self):
        """Adaptive-rho condensed warm chaining through the API: the carry
        holds per-lane rho (continuation restarts the iteration counter —
        the adaptive warm contract)."""
        x0s = _x0s()
        s = _solver(50, adaptive_rho=True, adaptive_rho_min=0.5,
                    adaptive_rho_max=5.0)
        out = s.solve_batch(x0s, method="condensed", return_carry=True)
        _, _, it_a, sv_a, carry = out
        x, u, it_b, sv_b = s.solve_batch(x0s, method="condensed", warm=carry)
        # continuation converges lanes phase 1 could not
        assert np.asarray(sv_b).sum() >= np.asarray(sv_a).sum()
        assert np.all(np.isfinite(u))
