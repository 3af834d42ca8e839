"""Fused Pallas solver kernel vs the XLA path (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tinympc_julia_tpu import Settings, init_state, make_problem, precompute_cache
from tinympc_julia_tpu.models import cartpole
from tinympc_julia_tpu.ops.pallas import make_fused_solver
from tinympc_julia_tpu.parallel import broadcast_state, set_x0_batch
from tinympc_julia_tpu.parallel.batch import solve_batch


def test_condensed_fused_matches_xla_condensed():
    """VMEM-resident condensed kernel vs the XLA condensed path: identical
    per-lane iteration counts and solutions."""
    from tinympc_julia_tpu.ops.condensed import build_condensed, solve_condensed
    from tinympc_julia_tpu.ops.pallas.condensed_kernel import (
        make_condensed_fused_solver)

    dtype = jnp.float32
    N = 20
    B = 256
    p = make_problem(jnp.asarray(cartpole.A, dtype),
                     jnp.asarray(cartpole.B, dtype),
                     jnp.asarray(np.diag(cartpole.Q_DIAG), dtype),
                     jnp.asarray(np.diag(cartpole.R_DIAG), dtype),
                     1.0, N, u_min=-5.0, u_max=5.0)
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(1.0, dtype))
    maps = build_condensed(p, c)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, size=(B, 4)), dtype)

    fn = make_condensed_fused_solver(
        4, 1, N, batch_tile=128, max_iter=80, en_input_bound=True,
        en_state_bound=False, relaxation_alpha=1.7,
        interpret=jax.default_backend() != "tpu")
    xs, us, iters, solved = fn(maps, c.rho, p.u_min, p.u_max, p.x_min,
                               p.x_max, x0s)

    s = Settings(max_iter=80, en_state_bound=False, en_input_bound=True,
                 relaxation_alpha=1.7)
    xs2, us2, it2, ok2 = solve_condensed(p, c, s, x0s, maps)

    both = (np.asarray(solved) == 1) & (np.asarray(ok2) == 1)
    assert both.sum() > B // 2
    np.testing.assert_array_equal(np.asarray(iters)[both],
                                  np.asarray(it2)[both])
    np.testing.assert_allclose(np.asarray(us)[both], np.asarray(us2)[both],
                               atol=1e-5, rtol=1e-5)


def test_fused_matches_xla():
    dtype = jnp.float32
    N = 20
    B = 256
    p = make_problem(jnp.asarray(cartpole.A, dtype),
                     jnp.asarray(cartpole.B, dtype),
                     jnp.asarray(np.diag(cartpole.Q_DIAG), dtype),
                     jnp.asarray(np.diag(cartpole.R_DIAG), dtype),
                     1.0, N, u_min=-5.0, u_max=5.0)
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(1.0, dtype))
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, size=(B, 4)), dtype)

    solver = make_fused_solver(4, 1, N, batch_tile=128, max_iter=60,
                               en_input_bound=True, en_state_bound=False,
                               interpret=jax.default_backend() != "tpu")
    xs, us, iters, solved = solver(p.A, p.B, p.f, p.Q, p.R, c.rho, c.Kinf,
                                   c.Quu_inv, c.AmBKt, c.Pinf,
                                   p.x_min, p.x_max, p.u_min, p.u_max,
                                   p.Xref, p.Uref, x0s)

    st0 = set_x0_batch(broadcast_state(init_state(4, 1, N, dtype), B), x0s)
    s = Settings(max_iter=60, en_state_bound=False, en_input_bound=True)
    _, _, sol = solve_batch(p, c, s, st0)

    both = (np.asarray(solved) == 1) & (np.asarray(sol.solved) == 1)
    assert both.sum() > B // 2
    np.testing.assert_array_equal(np.asarray(iters)[both],
                                  np.asarray(sol.iter)[both])
    np.testing.assert_allclose(np.asarray(us)[both], np.asarray(sol.u)[both],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(xs)[both], np.asarray(sol.x)[both],
                               atol=1e-5)


def test_condensed_fused_warm_continuation():
    """A solve of 30 iterations (carry_out) continued warm for 50 more
    reproduces a one-shot 80-iteration solve lane-for-lane: same per-lane
    totals, same solutions."""
    from tinympc_julia_tpu.ops.condensed import build_condensed
    from tinympc_julia_tpu.ops.pallas.condensed_kernel import (
        make_condensed_fused_solver)

    dtype = jnp.float32
    N = 20
    B = 256
    p = make_problem(jnp.asarray(cartpole.A, dtype),
                     jnp.asarray(cartpole.B, dtype),
                     jnp.asarray(np.diag(cartpole.Q_DIAG), dtype),
                     jnp.asarray(np.diag(cartpole.R_DIAG), dtype),
                     1.0, N, u_min=-5.0, u_max=5.0)
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(1.0, dtype))
    maps = build_condensed(p, c)
    rng = np.random.default_rng(1)
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, size=(B, 4)), dtype)
    bounds = (p.u_min, p.u_max, p.x_min, p.x_max)
    interp = jax.default_backend() != "tpu"
    kw = dict(en_input_bound=True, en_state_bound=False,
              relaxation_alpha=1.0, interpret=interp, batch_tile=128)

    one = make_condensed_fused_solver(4, 1, N, max_iter=80, **kw)
    xs1, us1, it1, ok1 = one(maps, c.rho, *bounds, x0s)

    ph1 = make_condensed_fused_solver(4, 1, N, max_iter=30, carry_out=True,
                                      **kw)
    ph2 = make_condensed_fused_solver(4, 1, N, max_iter=50, warm_start=True,
                                      **kw)
    xsa, usa, ita, oka, carry = ph1(maps, c.rho, *bounds, x0s)
    xsb, usb, itb, okb = ph2(maps, c.rho, *bounds, x0s, carry)

    it1_np, ita_np, itb_np = map(np.asarray, (it1, ita, itb))
    ok1_np, oka_np, okb_np = map(np.asarray, (ok1, oka, okb))
    # phase-1 converged lanes: identical latched results
    ca = oka_np == 1
    assert ca.any()
    np.testing.assert_array_equal(ita_np[ca], it1_np[ca])
    np.testing.assert_allclose(np.asarray(usa)[ca], np.asarray(us1)[ca],
                               atol=0)
    # continuation lanes: totals line up (30 + phase-2 count) and solutions
    # match the one-shot solve
    cb = (~ca) & (okb_np == 1) & (ok1_np == 1)
    assert cb.any()
    np.testing.assert_array_equal(30 + itb_np[cb], it1_np[cb])
    np.testing.assert_allclose(np.asarray(usb)[cb], np.asarray(us1)[cb],
                               atol=0)
    np.testing.assert_allclose(np.asarray(xsb)[cb], np.asarray(xs1)[cb],
                               atol=0)


def test_condensed_fused_check_termination_matches_xla():
    """Grouped residual checks (check_termination=2) reproduce the XLA path's
    Settings.check_termination semantics: identical per-lane counts."""
    from tinympc_julia_tpu.ops.condensed import build_condensed, solve_condensed
    from tinympc_julia_tpu.ops.pallas.condensed_kernel import (
        make_condensed_fused_solver)

    dtype = jnp.float32
    N = 20
    B = 256
    p = make_problem(jnp.asarray(cartpole.A, dtype),
                     jnp.asarray(cartpole.B, dtype),
                     jnp.asarray(np.diag(cartpole.Q_DIAG), dtype),
                     jnp.asarray(np.diag(cartpole.R_DIAG), dtype),
                     1.0, N, u_min=-5.0, u_max=5.0)
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(1.0, dtype))
    maps = build_condensed(p, c)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, size=(B, 4)), dtype)

    fn = make_condensed_fused_solver(
        4, 1, N, batch_tile=128, max_iter=80, en_input_bound=True,
        en_state_bound=False, relaxation_alpha=1.7, check_termination=2,
        interpret=jax.default_backend() != "tpu")
    xs, us, iters, solved = fn(maps, c.rho, p.u_min, p.u_max, p.x_min,
                               p.x_max, x0s)
    assert (np.asarray(iters)[np.asarray(solved) == 1] % 2 == 0).all()

    s = Settings(max_iter=80, en_state_bound=False, en_input_bound=True,
                 relaxation_alpha=1.7, check_termination=2)
    xs2, us2, it2, ok2 = solve_condensed(p, c, s, x0s, maps)
    both = (np.asarray(solved) == 1) & (np.asarray(ok2) == 1)
    assert both.sum() > B // 2
    np.testing.assert_array_equal(np.asarray(iters)[both],
                                  np.asarray(it2)[both])
    np.testing.assert_allclose(np.asarray(us)[both], np.asarray(us2)[both],
                               atol=1e-5, rtol=1e-5)


def test_condensed_fused_rocket_soc():
    """Fused kernel with per-stage SOC + box (the rocket configuration,
    selector-matmul projections) vs the XLA condensed path."""
    from tinympc_julia_tpu import ConeSet
    from tinympc_julia_tpu.models import rocket
    from tinympc_julia_tpu.ops.condensed import build_condensed, solve_condensed
    from tinympc_julia_tpu.ops.pallas.condensed_kernel import (
        make_condensed_fused_solver)

    dtype = jnp.float32
    N = rocket.HORIZON
    B = 128
    x_min, x_max, u_min, u_max = rocket.bounds(N)
    Xref, Uref = rocket.reference_trajectory(0)
    p = make_problem(jnp.asarray(rocket.A, dtype),
                     jnp.asarray(rocket.B, dtype),
                     jnp.asarray(np.diag(rocket.Q_DIAG), dtype),
                     jnp.asarray(np.diag(rocket.R_DIAG), dtype),
                     rocket.RHO, N, f=jnp.asarray(rocket.F, dtype),
                     x_min=jnp.asarray(x_min.T, dtype),
                     x_max=jnp.asarray(x_max.T, dtype),
                     u_min=jnp.asarray(u_min.T, dtype),
                     u_max=jnp.asarray(u_max.T, dtype),
                     Xref=jnp.asarray(Xref.T, dtype),
                     Uref=jnp.asarray(Uref.T, dtype),
                     cones_u=ConeSet(mus=jnp.asarray([rocket.MU_INPUT], dtype),
                                     starts=(0,), dims=(3,)),
                     cones_x=ConeSet(mus=jnp.asarray([rocket.MU_STATE], dtype),
                                     starts=(0,), dims=(3,)))
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(rocket.RHO, dtype))
    maps = build_condensed(p, c)
    rng = np.random.default_rng(3)
    x0s = jnp.asarray(rocket.X_INIT[None, :]
                      + rng.uniform(-0.2, 0.2, size=(B, 6)), dtype)

    fn = make_condensed_fused_solver(
        6, 3, N, batch_tile=64, max_iter=200, abs_pri_tol=2e-3,
        abs_dua_tol=1e-3, en_input_bound=True, en_state_bound=True,
        soc_u=((0, 3, rocket.MU_INPUT),), soc_x=((0, 3, rocket.MU_STATE),),
        interpret=jax.default_backend() != "tpu")
    xs, us, iters, solved = fn(maps, c.rho, p.u_min, p.u_max, p.x_min,
                               p.x_max, x0s)

    s = Settings(max_iter=200, abs_pri_tol=2e-3, abs_dua_tol=1e-3,
                 en_state_bound=True, en_input_bound=True,
                 en_input_soc=True, en_state_soc=True)
    xs2, us2, it2, ok2 = solve_condensed(p, c, s, x0s, maps)

    both = (np.asarray(solved) == 1) & (np.asarray(ok2) == 1)
    assert both.sum() > B // 2
    np.testing.assert_array_equal(np.asarray(iters)[both],
                                  np.asarray(it2)[both])
    np.testing.assert_allclose(np.asarray(us)[both], np.asarray(us2)[both],
                               atol=1e-4, rtol=1e-4)
    # thrust cone satisfied: ||u[0:2]|| <= mu * u[2]
    uu = np.asarray(us)[both]
    lhs = np.linalg.norm(uu[..., :2], axis=-1)
    assert (lhs <= rocket.MU_INPUT * uu[..., 2] + 5e-3).all()


def test_condensed_fused_halfspaces():
    """Fused kernel with per-stage linear halfspace rows vs the XLA path."""
    from tinympc_julia_tpu.ops.condensed import build_condensed, solve_condensed
    from tinympc_julia_tpu.ops.pallas.condensed_kernel import (
        make_condensed_fused_solver)

    dtype = jnp.float32
    N = 20
    B = 128
    Alin_x = np.array([[1.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.5]])
    blin_x = np.array([1.0, 0.8])
    p = make_problem(jnp.asarray(cartpole.A, dtype),
                     jnp.asarray(cartpole.B, dtype),
                     jnp.asarray(np.diag(cartpole.Q_DIAG), dtype),
                     jnp.asarray(np.diag(cartpole.R_DIAG), dtype),
                     1.0, N, u_min=-5.0, u_max=5.0,
                     Alin_x=jnp.asarray(Alin_x, dtype),
                     blin_x=jnp.asarray(blin_x, dtype))
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(1.0, dtype))
    maps = build_condensed(p, c)
    rng = np.random.default_rng(4)
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, size=(B, 4)), dtype)

    fn = make_condensed_fused_solver(
        4, 1, N, batch_tile=64, max_iter=150, en_input_bound=True,
        en_state_bound=False, lin_x=(Alin_x, blin_x),
        interpret=jax.default_backend() != "tpu")
    xs, us, iters, solved = fn(maps, c.rho, p.u_min, p.u_max, p.x_min,
                               p.x_max, x0s)

    s = Settings(max_iter=150, en_state_bound=False, en_input_bound=True,
                 en_state_linear=True)
    xs2, us2, it2, ok2 = solve_condensed(p, c, s, x0s, maps)
    both = (np.asarray(solved) == 1) & (np.asarray(ok2) == 1)
    assert both.sum() > B // 2
    # The kernel's fused T12 matmul reassociates float ops vs the XLA path's
    # T1/T2 pair, so a borderline lane may converge one check earlier/later;
    # require near-total agreement and bounded drift on the rest.
    ita, itb = np.asarray(iters)[both], np.asarray(it2)[both]
    same = ita == itb
    assert same.mean() >= 0.95
    assert (np.abs(ita - itb) <= 1).all()
    np.testing.assert_allclose(np.asarray(us)[both][same],
                               np.asarray(us2)[both][same],
                               atol=1e-4, rtol=1e-4)


def test_adaptive_fused_matches_xla_adaptive():
    """Adaptive-rho fused kernel vs solve_condensed_adaptive: identical
    per-lane iteration counts and final rho (f32)."""
    from tinympc_julia_tpu.ops.condensed import (build_condensed_taylor,
                                                 solve_condensed_adaptive)
    from tinympc_julia_tpu.ops.pallas.adaptive_kernel import (
        make_condensed_adaptive_fused_solver)

    dtype = jnp.float32
    N = 20
    B = 128
    p = make_problem(jnp.asarray(cartpole.A, dtype),
                     jnp.asarray(cartpole.B, dtype),
                     jnp.asarray(np.diag(cartpole.Q_DIAG), dtype),
                     jnp.asarray(np.diag(cartpole.R_DIAG), dtype),
                     1.0, N, u_min=-5.0, u_max=5.0)
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(1.0, dtype))
    tmaps = build_condensed_taylor(p, c, order=2)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, size=(B, 4)), dtype)

    fn = make_condensed_adaptive_fused_solver(
        np.asarray(p.A), np.asarray(p.B), np.asarray(p.Q), np.asarray(p.R),
        np.asarray(c.Pinf), np.asarray(c.dPinf_drho), N,
        batch_tile=64, max_iter=200, en_input_bound=True,
        en_state_bound=False, adaptive_rho_min=0.5, adaptive_rho_max=5.0,
        interpret=jax.default_backend() != "tpu")
    xs, us, iters, solved, rho = fn(tmaps, p.u_min, p.u_max, p.x_min,
                                    p.x_max, x0s)

    s = Settings(max_iter=200, en_state_bound=False, en_input_bound=True,
                 adaptive_rho=True, adaptive_rho_min=0.5,
                 adaptive_rho_max=5.0, adaptive_rho_enable_clipping=True)
    xs2, us2, it2, ok2, carry = solve_condensed_adaptive(
        p, c, s, x0s, tmaps, return_carry=True)

    both = (np.asarray(solved) == 1) & (np.asarray(ok2) == 1)
    assert both.sum() > B * 3 // 4
    np.testing.assert_array_equal(np.asarray(iters)[both],
                                  np.asarray(it2)[both])
    np.testing.assert_allclose(np.asarray(rho)[both],
                               np.asarray(carry.rho)[both], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(us)[both], np.asarray(us2)[both],
                               atol=1e-4, rtol=1e-4)


def test_adaptive_fused_warm_continuation_matches_xla():
    """Adaptive kernel two-phase (carry_out -> warm_start continuation)
    vs the XLA adaptive path doing the identical two-phase: per-lane
    iteration counts, rho, and solutions agree.  This is the straggler
    pipeline for adaptive workloads (VERDICT r2 item 2b)."""
    from tinympc_julia_tpu.ops.condensed import (AdaptiveCondensedCarry,
                                                 build_condensed_taylor,
                                                 solve_condensed_adaptive)
    from tinympc_julia_tpu.ops.pallas.adaptive_kernel import (
        make_condensed_adaptive_fused_solver)

    dtype = jnp.float32
    N = 20
    B = 128
    p = make_problem(jnp.asarray(cartpole.A, dtype),
                     jnp.asarray(cartpole.B, dtype),
                     jnp.asarray(np.diag(cartpole.Q_DIAG), dtype),
                     jnp.asarray(np.diag(cartpole.R_DIAG), dtype),
                     1.0, N, u_min=-5.0, u_max=5.0)
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(1.0, dtype))
    tmaps = build_condensed_taylor(p, c, order=2)
    rng = np.random.default_rng(5)
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, size=(B, 4)), dtype)
    interp = jax.default_backend() != "tpu"
    kw = dict(en_input_bound=True, en_state_bound=False,
              adaptive_rho_min=0.5, adaptive_rho_max=5.0)

    fn1 = make_condensed_adaptive_fused_solver(
        np.asarray(p.A), np.asarray(p.B), np.asarray(p.Q), np.asarray(p.R),
        np.asarray(c.Pinf), np.asarray(c.dPinf_drho), N,
        batch_tile=64, max_iter=30, carry_out=True, interpret=interp, **kw)
    fn2 = make_condensed_adaptive_fused_solver(
        np.asarray(p.A), np.asarray(p.B), np.asarray(p.Q), np.asarray(p.R),
        np.asarray(c.Pinf), np.asarray(c.dPinf_drho), N,
        batch_tile=64, max_iter=400, warm_start=True, interpret=interp, **kw)

    _, _, it1, ok1, rho1, carry = fn1(tmaps, p.u_min, p.u_max, p.x_min,
                                      p.x_max, x0s)
    xs2, us2, it2, ok2, rho2 = fn2(tmaps, p.u_min, p.u_max, p.x_min, p.x_max,
                                   x0s, carry)

    # XLA path, identical two-phase
    s1 = Settings(max_iter=30, en_state_bound=False, en_input_bound=True,
                  adaptive_rho=True, adaptive_rho_min=0.5,
                  adaptive_rho_max=5.0)
    s2 = s1.replace(max_iter=400)
    _, _, jt1, jok1, jcarry = solve_condensed_adaptive(
        p, c, s1, x0s, tmaps, return_carry=True)
    jxs, jus, jt2, jok2, jc2 = solve_condensed_adaptive(
        p, c, s2, x0s, tmaps, warm=jcarry, return_carry=True)

    # phase 1: some but not all converge; kernel matches XLA per-lane
    assert 0 < int(np.sum(np.asarray(ok1))) < B
    np.testing.assert_array_equal(np.asarray(ok1), np.asarray(jok1))
    np.testing.assert_array_equal(np.asarray(it1), np.asarray(jt1))
    # the kernel carry equals the XLA carry (f32 reassociation tolerance)
    for a, b in zip(carry[:5], (jcarry.d, jcarry.y, jcarry.g, jcarry.v,
                                jcarry.z)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(carry.rho[0]),
                               np.asarray(jcarry.rho), rtol=1e-5)

    # phase 2 continuation agrees per-lane where both converge
    both = (np.asarray(ok2) == 1) & (np.asarray(jok2) == 1)
    assert both.mean() > 0.9
    same = np.asarray(it2)[both] == np.asarray(jt2)[both]
    assert same.mean() >= 0.95
    np.testing.assert_allclose(np.asarray(rho2)[both][same],
                               np.asarray(jc2.rho)[both][same], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(us2)[both][same],
                               np.asarray(jus)[both][same],
                               atol=1e-4, rtol=1e-4)


def test_adaptive_fused_check_termination():
    """check_termination=5 on the adaptive kernel vs the XLA path with the
    same setting: iteration counts land on multiples of 5 and match."""
    from tinympc_julia_tpu.ops.condensed import (build_condensed_taylor,
                                                 solve_condensed_adaptive)
    from tinympc_julia_tpu.ops.pallas.adaptive_kernel import (
        make_condensed_adaptive_fused_solver)

    dtype = jnp.float32
    N = 20
    B = 64
    p = make_problem(jnp.asarray(cartpole.A, dtype),
                     jnp.asarray(cartpole.B, dtype),
                     jnp.asarray(np.diag(cartpole.Q_DIAG), dtype),
                     jnp.asarray(np.diag(cartpole.R_DIAG), dtype),
                     1.0, N, u_min=-5.0, u_max=5.0)
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(1.0, dtype))
    tmaps = build_condensed_taylor(p, c, order=2)
    rng = np.random.default_rng(6)
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, size=(B, 4)), dtype)

    fn = make_condensed_adaptive_fused_solver(
        np.asarray(p.A), np.asarray(p.B), np.asarray(p.Q), np.asarray(p.R),
        np.asarray(c.Pinf), np.asarray(c.dPinf_drho), N,
        batch_tile=64, max_iter=400, check_termination=5,
        en_input_bound=True, en_state_bound=False,
        adaptive_rho_min=0.5, adaptive_rho_max=5.0,
        interpret=jax.default_backend() != "tpu")
    _, us, iters, solved, rho = fn(tmaps, p.u_min, p.u_max, p.x_min,
                                   p.x_max, x0s)

    s = Settings(max_iter=400, check_termination=5, en_state_bound=False,
                 en_input_bound=True, adaptive_rho=True,
                 adaptive_rho_min=0.5, adaptive_rho_max=5.0)
    _, us2, it2, ok2, jc = solve_condensed_adaptive(p, c, s, x0s, tmaps,
                                                    return_carry=True)

    conv = np.asarray(solved) == 1
    assert conv.mean() > 0.85
    assert (np.asarray(iters)[conv] % 5 == 0).all()
    both = conv & (np.asarray(ok2) == 1)
    np.testing.assert_array_equal(np.asarray(iters)[both],
                                  np.asarray(it2)[both])
    np.testing.assert_allclose(np.asarray(us)[both], np.asarray(us2)[both],
                               atol=1e-4, rtol=1e-4)


def test_adaptive_fused_termination_controller_matches_xla():
    """VERDICT r4 item 2: the termination-residual controller
    (ops/rho.termination_controller) live inside the adaptive fused kernel,
    pinned bitwise-on-rho against the condensed XLA path on a mis-set-low
    rho0 where rho genuinely moves (up to the Taylor trust clip and down
    through the deadband)."""
    from tinympc_julia_tpu.ops.condensed import (build_condensed_taylor,
                                                 solve_condensed_adaptive)
    from tinympc_julia_tpu.ops.pallas.adaptive_kernel import (
        make_condensed_adaptive_fused_solver)

    dtype = jnp.float32
    N = 20
    B = 16
    RHO0 = 0.5
    xmax = np.array([2.0, 1e17, 1e17, 1e17])
    p = make_problem(jnp.asarray(cartpole.A, dtype),
                     jnp.asarray(cartpole.B, dtype),
                     jnp.asarray(np.diag(cartpole.Q_DIAG), dtype),
                     jnp.asarray(np.diag(cartpole.R_DIAG), dtype),
                     RHO0, N, u_min=-5.0, u_max=5.0,
                     x_min=jnp.asarray(np.tile(-xmax, (N, 1)), dtype),
                     x_max=jnp.asarray(np.tile(xmax, (N, 1)), dtype))
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(RHO0, dtype))
    tmaps = build_condensed_taylor(p, c, order=2)
    rng = np.random.default_rng(5)
    x0s = jnp.asarray(rng.uniform(-1, 1, size=(B, 4))
                      * np.array([1.8, 1.0, 0.4, 0.5]), dtype)

    s = Settings(max_iter=200, en_state_bound=True, en_input_bound=True,
                 adaptive_rho=True, adaptive_rho_controller="termination",
                 adaptive_rho_min=1e-4, adaptive_rho_max=1e4,
                 adaptive_rho_taylor_trust=2.0)
    _, us1, it1, ok1, jc = solve_condensed_adaptive(p, c, s, x0s, tmaps,
                                                    return_carry=True)
    fn = make_condensed_adaptive_fused_solver(
        np.asarray(p.A), np.asarray(p.B), np.asarray(p.Q), np.asarray(p.R),
        np.asarray(c.Pinf), np.asarray(c.dPinf_drho), N,
        batch_tile=16, max_iter=200, en_state_bound=True,
        en_input_bound=True, controller="termination",
        adaptive_rho_min=1e-4, adaptive_rho_max=1e4, taylor_trust=2.0,
        interpret=jax.default_backend() != "tpu")
    _, us2, it2, ok2, rho2 = fn(tmaps, p.u_min, p.u_max, p.x_min, p.x_max,
                                x0s)

    np.testing.assert_array_equal(np.asarray(it1), np.asarray(it2))
    np.testing.assert_array_equal(np.asarray(jc.rho), np.asarray(rho2))
    rho = np.asarray(rho2)
    assert rho.max() == RHO0 + 2.0 and rho.min() < RHO0  # rho really moved
    both = (np.asarray(ok1) == 1) & (np.asarray(ok2) == 1)
    np.testing.assert_allclose(np.asarray(us1)[both], np.asarray(us2)[both],
                               atol=1e-4)


def test_adaptive_fused_rocket_soc_matches_xla():
    """VERDICT r4 item 4 (single-group leg): the adaptive fused kernel with
    the full SOC/box stack (selector-matmul projections shared with the
    fixed-rho kernel) pins per-lane against solve_condensed_adaptive on the
    rocket-landing config."""
    from tinympc_julia_tpu import ConeSet
    from tinympc_julia_tpu.models import rocket
    from tinympc_julia_tpu.ops.condensed import (build_condensed_taylor,
                                                 solve_condensed_adaptive)
    from tinympc_julia_tpu.ops.pallas.adaptive_kernel import (
        make_condensed_adaptive_fused_solver)

    dtype = jnp.float32
    N = rocket.HORIZON
    B = 8
    xb = rocket.bounds()
    p = make_problem(
        jnp.asarray(rocket.A, dtype), jnp.asarray(rocket.B, dtype),
        jnp.asarray(np.diag(rocket.Q_DIAG), dtype),
        jnp.asarray(np.diag(rocket.R_DIAG), dtype), rocket.RHO, N,
        f=jnp.asarray(rocket.F, dtype),
        x_min=jnp.asarray(xb[0].T, dtype), x_max=jnp.asarray(xb[1].T, dtype),
        u_min=-10.0, u_max=105.0,
        cones_u=ConeSet(mus=jnp.asarray([rocket.MU_INPUT], dtype),
                        starts=(0,), dims=(3,)),
        cones_x=ConeSet(mus=jnp.asarray([rocket.MU_STATE], dtype),
                        starts=(0,), dims=(3,)))
    Xref, Uref = rocket.reference_trajectory(0)
    p = p.replace(Xref=jnp.asarray(Xref.T, dtype),
                  Uref=jnp.asarray(Uref.T, dtype))
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(rocket.RHO, dtype))
    tmaps = build_condensed_taylor(p, c)
    rng = np.random.default_rng(2)
    x0s = jnp.asarray(rocket.X_INIT[None, :]
                      * rng.uniform(0.9, 1.1, size=(B, 1)), dtype)

    s = Settings(max_iter=100, abs_pri_tol=2e-3, abs_dua_tol=1e-3,
                 en_state_bound=True, en_input_bound=True,
                 en_input_soc=True, en_state_soc=True, adaptive_rho=True,
                 adaptive_rho_min=1.0, adaptive_rho_max=100.0)
    _, us1, it1, ok1, jc = solve_condensed_adaptive(p, c, s, x0s, tmaps,
                                                    return_carry=True)
    fn = make_condensed_adaptive_fused_solver(
        np.asarray(p.A), np.asarray(p.B), np.asarray(p.Q), np.asarray(p.R),
        np.asarray(c.Pinf), np.asarray(c.dPinf_drho), N,
        batch_tile=8, max_iter=100, abs_pri_tol=2e-3, abs_dua_tol=1e-3,
        en_state_bound=True, en_input_bound=True,
        adaptive_rho_min=1.0, adaptive_rho_max=100.0,
        soc_u=((0, 3, rocket.MU_INPUT),), soc_x=((0, 3, rocket.MU_STATE),),
        interpret=jax.default_backend() != "tpu")
    _, us2, it2, ok2, rho2 = fn(tmaps, p.u_min, p.u_max, p.x_min, p.x_max,
                                x0s)
    np.testing.assert_array_equal(np.asarray(it1), np.asarray(it2))
    assert int(np.asarray(ok2).sum()) == B
    np.testing.assert_allclose(np.asarray(jc.rho), np.asarray(rho2),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(us1), np.asarray(us2), atol=1e-4)


def test_bf16_head_matches_chained_pipeline():
    """bf16_head_iters (the in-kernel precision-staged head) reproduces the
    chained fn0(DEFAULT, ct=k0, carry_out) -> fn1(warm) pipeline: identical
    per-lane iteration counts and solved flags, iterates to float
    reassociation (the head runs as a fori_loop; XLA compiles the same
    formula with different association than the chained kernels).  On CPU
    DEFAULT precision == f32, so this pins the control flow; the bf16
    numerics are the chip-measured perf story (docs/DESIGN.md §5)."""
    from tinympc_julia_tpu.ops.condensed import build_condensed
    from tinympc_julia_tpu.ops.pallas.condensed_kernel import (
        make_condensed_fused_solver)

    dtype = jnp.float32
    N = 20
    B = 32
    p = make_problem(jnp.asarray(cartpole.A, dtype),
                     jnp.asarray(cartpole.B, dtype),
                     jnp.asarray(np.diag(cartpole.Q_DIAG), dtype),
                     jnp.asarray(np.diag(cartpole.R_DIAG), dtype),
                     1.0, N, u_min=-5.0, u_max=5.0)
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(1.0, dtype))
    maps = build_condensed(p, c)
    bounds = (p.u_min, p.u_max, p.x_min, p.x_max)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, size=(B, 4)), dtype)
    kw = dict(en_input_bound=True, en_state_bound=False,
              relaxation_alpha=1.7,
              interpret=jax.default_backend() != "tpu")

    merged = make_condensed_fused_solver(
        4, 1, N, batch_tile=8, max_iter=48, check_termination=4,
        bf16_head_iters=8, **kw)
    fn0 = make_condensed_fused_solver(
        4, 1, N, batch_tile=8, max_iter=8, check_termination=8,
        carry_out=True, precision=jax.lax.Precision.DEFAULT, **kw)
    fn1 = make_condensed_fused_solver(
        4, 1, N, batch_tile=8, max_iter=40, check_termination=4,
        warm_start=True, **kw)
    xs_m, us_m, it_m, ok_m = merged(maps, c.rho, *bounds, x0s)
    _, _, it0, ok0, carry = fn0(maps, c.rho, *bounds, x0s)
    xs_c, us_c, it1, ok1 = fn1(maps, c.rho, *bounds, x0s, carry)

    ok_chain = np.maximum(np.asarray(ok0), np.asarray(ok1))
    it_chain = np.where(np.asarray(ok0) == 1, np.asarray(it0),
                        8 + np.asarray(it1))
    np.testing.assert_array_equal(np.asarray(ok_m), ok_chain)
    np.testing.assert_array_equal(np.asarray(it_m), it_chain)
    np.testing.assert_allclose(np.asarray(us_m), np.asarray(us_c),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(xs_m), np.asarray(xs_c),
                               atol=1e-5)
    assert int(ok_chain.sum()) > B * 3 // 4  # the config genuinely solves


def test_bf16_head_validation():
    from tinympc_julia_tpu.ops.pallas.condensed_kernel import (
        make_condensed_fused_solver)
    with pytest.raises(ValueError, match="bf16_head_iters"):
        make_condensed_fused_solver(4, 1, 20, max_iter=48,
                                    check_termination=4, bf16_head_iters=6)
    with pytest.raises(ValueError, match="bf16_head_iters"):
        make_condensed_fused_solver(4, 1, 20, max_iter=48,
                                    check_termination=4, bf16_head_iters=48)


def test_bf16_head_k0_1_cold_start():
    """Regression (r5 review): bf16_head_iters=1 cold start used to run
    iteration 0 twice, shifting every lane's iteration count.  On CPU
    (DEFAULT == f32) a 1-iteration head must match the plain kernel
    bitwise."""
    from tinympc_julia_tpu.ops.condensed import build_condensed
    from tinympc_julia_tpu.ops.pallas.condensed_kernel import (
        make_condensed_fused_solver)

    dtype = jnp.float32
    N = 20
    p = make_problem(jnp.asarray(cartpole.A, dtype),
                     jnp.asarray(cartpole.B, dtype),
                     jnp.asarray(np.diag(cartpole.Q_DIAG), dtype),
                     jnp.asarray(np.diag(cartpole.R_DIAG), dtype),
                     1.0, N, u_min=-5.0, u_max=5.0)
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(1.0, dtype))
    maps = build_condensed(p, c)
    bounds = (p.u_min, p.u_max, p.x_min, p.x_max)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, size=(16, 4)), dtype)
    kw = dict(en_input_bound=True, en_state_bound=False,
              relaxation_alpha=1.7, check_termination=1, batch_tile=8,
              max_iter=48, interpret=jax.default_backend() != "tpu")
    plain = make_condensed_fused_solver(4, 1, N, **kw)
    head1 = make_condensed_fused_solver(4, 1, N, bf16_head_iters=1, **kw)
    _, us_p, it_p, ok_p = plain(maps, c.rho, *bounds, x0s)
    _, us_h, it_h, ok_h = head1(maps, c.rho, *bounds, x0s)
    np.testing.assert_array_equal(np.asarray(it_p), np.asarray(it_h))
    np.testing.assert_array_equal(np.asarray(ok_p), np.asarray(ok_h))
    np.testing.assert_allclose(np.asarray(us_p), np.asarray(us_h),
                               atol=1e-6)


def test_adaptive_carry_converts_to_fixed_kernel():
    """The bench quadrotor row's phase-2 requantization converts an
    AdaptiveFusedCarry into the fixed kernel's FusedCarry via
    w2 = [z - y; v - g].  With rho pinned (min == max == rho0, so the
    adaptive path degenerates to fixed rho and the Taylor corrections
    vanish), continuing on the fixed kernel must equal continuing on the
    adaptive kernel lane-for-lane."""
    from tinympc_julia_tpu.ops.condensed import (build_condensed,
                                                 build_condensed_taylor)
    from tinympc_julia_tpu.ops.pallas.adaptive_kernel import (
        make_condensed_adaptive_fused_solver)
    from tinympc_julia_tpu.ops.pallas.condensed_kernel import (
        FusedCarry, make_condensed_fused_solver)

    dtype = jnp.float32
    N = 20
    B = 16
    p = make_problem(jnp.asarray(cartpole.A, dtype),
                     jnp.asarray(cartpole.B, dtype),
                     jnp.asarray(np.diag(cartpole.Q_DIAG), dtype),
                     jnp.asarray(np.diag(cartpole.R_DIAG), dtype),
                     1.0, N, u_min=-5.0, u_max=5.0)
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(1.0, dtype))
    tmaps = build_condensed_taylor(p, c)
    maps = build_condensed(p, c)
    rng = np.random.default_rng(3)
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, size=(B, 4)), dtype)
    bounds = (p.u_min, p.u_max, p.x_min, p.x_max)
    interp = jax.default_backend() != "tpu"

    mk = lambda **k: make_condensed_adaptive_fused_solver(  # noqa: E731
        np.asarray(p.A), np.asarray(p.B), np.asarray(p.Q), np.asarray(p.R),
        np.asarray(c.Pinf), np.asarray(c.dPinf_drho), N, batch_tile=8,
        en_input_bound=True, en_state_bound=False,
        adaptive_rho_min=1.0, adaptive_rho_max=1.0, interpret=interp, **k)
    fn1 = mk(max_iter=20, carry_out=True)
    fn2_adaptive = mk(max_iter=100, warm_start=True)
    fn2_fixed = make_condensed_fused_solver(
        4, 1, N, batch_tile=8, max_iter=100, warm_start=True,
        en_input_bound=True, en_state_bound=False, interpret=interp)

    _, _, it1, ok1, _rho, carry = fn1(tmaps, *bounds, x0s)
    _, us_a, it_a, ok_a, _r2 = fn2_adaptive(tmaps, *bounds, x0s, carry)
    w2 = jnp.concatenate([carry.z - carry.y, carry.v - carry.g], axis=0)
    warm = FusedCarry(w2, carry.y, carry.g, carry.v, carry.z)
    _, us_f, it_f, ok_f = fn2_fixed(maps, c.rho, *bounds, x0s, warm)

    np.testing.assert_array_equal(np.asarray(it_a), np.asarray(it_f))
    np.testing.assert_array_equal(np.asarray(ok_a), np.asarray(ok_f))
    both = np.asarray(ok_a) == 1
    assert both.sum() > B // 2
    # the adaptive kernel applies T1 then T2 (stacked Taylor blocks); the
    # fixed kernel applies the iteration-fused T12 — equal in exact
    # arithmetic, float-reassociation-level differences compound over the
    # continuation (the established fast-path tolerance class)
    np.testing.assert_allclose(np.asarray(us_a)[both],
                               np.asarray(us_f)[both], atol=1e-4)
