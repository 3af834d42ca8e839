"""Bucketed exact-rebuild adaptive-rho: the fast path for mis-set rho0.

The capability being made throughput-viable (VERDICT r4 item 1): the
standard path's ``adaptive_rho_rebuild`` extension — termination-residual
controller + exact on-device Riccati rebuild (ops/rho.py) — demonstrably
rescues workloads whose rho0 is mis-set by orders of magnitude (98% vs 52%
convergence on the mis-set cartpole, docs/DESIGN.md §4), but nesting a
Riccati fixed point inside every solve loop runs at ~400 solves/s.  The
reference anchor being transcended is re-running
``tiny_precompute_and_set_cache``
(/root/reference/src/codegen_src/tinympc/tiny_api.cpp:124-190) instead of
the first-order Taylor patch (rho_benchmark.cpp:199-212).

TPU-native restructuring: adaptation becomes PHASES instead of a nested
fixed point per update gate, and the rebuilt caches become STATIC —
everything data-dependent is a gather.

  setup    Pick G log-spaced bucket rhos spanning [adaptive_rho_min,
           adaptive_rho_max].  For each, rebuild the cache EXACTLY
           (ops/rho.rebuild_update cold start == re-running setup at that
           rho; the linear-cost fold stays at rho0, exactly the standard
           rebuild path's semantics) and build grouped condensed maps.
           One-time cost; no rho-dependent work remains in the solve.
  phase 1  k fixed-rho0 iterations on the fused kernel (carry_out).
  predict  ONE condensed iteration in XLA from the carry gives per-lane
           termination residuals; rho* = rho0 * sqrt((pri/pri_tol)
           / (dua/dua_tol)) (ops/rho.termination_controller's estimate,
           uncapped — the exact rebuild has no trust radius), quantized to
           the nearest bucket in log space.  Quantization is safe because
           measured iteration counts are FLAT across ~3 decades of rho
           around the optimum (docs/DESIGN.md §4) — the controller only
           needs to land in the flat region, not on a point.
  phase 2  Unconverged lanes are compacted per bucket into static slots
           and CONTINUE (warm, scaled duals kept — the reference's
           update-in-place semantics) on the grouped fused kernel, each
           bucket riding its own exact maps.

Per-lane phase-2 semantics equal a fixed-rho_g warm continuation (the
pinned fused-kernel contract); end-to-end solutions pin against the
standard rebuild path's converged solutions in tests/test_rebuild.py.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..types import Cache, Problem, Settings
from ..ops import rho as rho_mod
from ..ops.condensed import (_cones_stacked, _halfspaces_stacked,
                             build_condensed)
from .grouped import stack_instances


class BucketedRebuildPipeline(NamedTuple):
    """The compiled pipeline plus its static configuration."""
    solve: callable          # (x0s (B, nx)) -> see make_bucketed_rebuild
    bucket_rhos: tuple       # the G static bucket centers
    phase1_iters: int
    phase2_iters: int
    straggler_slots: int     # per-bucket phase-2 slots


def compact_members(member, slots: int):
    """Static-shape per-group compaction shared by every straggler/bucket
    pipeline: ``member`` is a (G, M) bool matrix of group membership;
    returns (idx (G, slots) member positions with index-0 fill,
    counts (G,), valid (G*slots,) slot-validity mask, overflow (G,) int32
    counts of members beyond ``slots``).  Callers must drop writes from
    invalid slots (index-0 fill re-selects position 0) — the established
    where/scatter-drop pattern."""
    idx = jax.vmap(
        lambda mk: jnp.nonzero(mk, size=slots, fill_value=0)[0])(member)
    counts = member.sum(axis=1)
    valid = (jnp.arange(slots)[None, :] < counts[:, None]).reshape(-1)
    overflow = jnp.maximum(counts - slots, 0).astype(jnp.int32)
    return idx, counts, valid, overflow


def default_bucket_rhos(rho_min: float, rho_max: float,
                        per_decade: float = 0.5) -> tuple:
    """Log-spaced bucket centers covering [rho_min, rho_max] at
    ``per_decade`` buckets per decade.  Default 0.5 (2-decade spacing):
    measured iteration counts are FLAT across ~3 decades of rho, so a
    quantization error of up to one decade stays well inside the flat
    region — and every extra bucket costs pad tiles in phase 2 (measured:
    9 buckets -> 5 on the misset-cartpole span was +19% solve rate at
    identical convergence, docs/DESIGN.md §4)."""
    lo, hi = np.log10(rho_min), np.log10(rho_max)
    n = max(2, int(np.ceil((hi - lo) * per_decade)) + 1)
    return tuple(float(r) for r in np.logspace(lo, hi, n))


def rebuild_bucket_caches(problem: Problem, cache: Cache,
                          bucket_rhos: Sequence[float]) -> Cache:
    """Exact per-bucket cache rebuilds (stacked along a leading G axis).

    Each bucket cache is ops/rho.rebuild_update at the bucket rho with a
    COLD-started fixed point — bitwise what ``tiny_setup`` +
    ``tiny_precompute_and_set_cache`` (tiny_api.cpp:21-190) would produce
    at that rho (pinned in tests/test_rho_rebuild.py) — while the Problem
    (and its rho0-folded linear costs) stays shared, exactly the standard
    rebuild path's semantics."""
    with jax.default_matmul_precision("highest"):
        return stack_instances([
            rho_mod.rebuild_update(cache, problem, r, warm=False)
            for r in bucket_rhos])


def predict_rho_bucketed(problem: Problem, settings: Settings, maps, carry,
                         x0s, rho0, bucket_rhos):
    """Per-lane rho prediction + log-space bucket quantization from a
    phase-1 FusedCarry: ONE condensed iteration in XLA reproduces the
    iterates the in-loop controller would see (x, u, znew, vnew vs the
    carried previous slacks), then rho* = rho0 * sqrt((pri/pri_tol) /
    (dua/dua_tol)) — the ops/rho.termination_controller estimate without
    step cap or deadband (one-shot prediction feeding an EXACT rebuild:
    the quantizer replaces both).  Returns (bucket_idx (B,), rho_pred (B,)).
    """
    nx, nu, N = problem.nx, problem.nu, problem.N
    su, sx = (N - 1) * nu, N * nx
    sw = su + sx
    dtype = x0s.dtype
    T12 = maps.T12
    T1 = maps.T1
    with jax.default_matmul_precision("highest"):
        ux = (T12[:, :sw] @ carry.w2 + T12[:, -1:]
              + T1[:, su:su + nx] @ x0s.T + T1[:, -1:])
    u, x = ux[:su], ux[su:]
    alpha = settings.relaxation_alpha
    if alpha != 1.0:
        u_hat = alpha * u + (1.0 - alpha) * carry.z
        x_hat = alpha * x + (1.0 - alpha) * carry.v
    else:
        u_hat, x_hat = u, x
    znew = u_hat + carry.y
    vnew = x_hat + carry.g
    if settings.en_input_bound:
        znew = jnp.clip(znew, problem.u_min.reshape(su, 1),
                        problem.u_max.reshape(su, 1))
    if settings.en_state_bound:
        vnew = jnp.clip(vnew, problem.x_min.reshape(sx, 1),
                        problem.x_max.reshape(sx, 1))
    if settings.en_input_linear:
        znew = _halfspaces_stacked(znew, problem.Alin_u, problem.blin_u,
                                   N - 1, nu)
    if settings.en_state_linear:
        vnew = _halfspaces_stacked(vnew, problem.Alin_x, problem.blin_x,
                                   N, nx)
    if settings.en_input_soc:
        znew = _cones_stacked(znew, problem.cones_u, N - 1, nu)
    if settings.en_state_soc:
        vnew = _cones_stacked(vnew, problem.cones_x, N, nx)

    pri = jnp.maximum(jnp.max(jnp.abs(x - vnew), axis=0),
                      jnp.max(jnp.abs(u - znew), axis=0))
    dua = rho0 * jnp.maximum(jnp.max(jnp.abs(carry.v - vnew), axis=0),
                             jnp.max(jnp.abs(carry.z - znew), axis=0))
    eps = jnp.asarray(rho_mod.EPS, dtype)
    pri_tol = jnp.asarray(settings.abs_pri_tol, dtype)
    dua_tol = jnp.asarray(settings.abs_dua_tol, dtype)
    ratio = (pri / pri_tol) / (dua / dua_tol + eps)
    rho_pred = rho0 * jnp.sqrt(ratio)
    rho_pred = jnp.clip(rho_pred,
                        jnp.asarray(settings.adaptive_rho_min, dtype),
                        jnp.asarray(settings.adaptive_rho_max, dtype))
    centers = jnp.log(jnp.asarray(bucket_rhos, dtype))
    bucket = jnp.argmin(
        jnp.abs(jnp.log(rho_pred)[:, None] - centers[None, :]), axis=1)
    return bucket, rho_pred


def make_bucketed_rebuild(problem: Problem, cache: Cache,
                          settings: Settings, *,
                          bucket_rhos: Optional[Sequence[float]] = None,
                          phase1_iters: int = 50,
                          straggler_slots: int = 512,
                          phase2_iters: int = 500,
                          batch_tile: Optional[int] = None,
                          phase1_bf16: bool = False,
                          phase2_bf16_iters: int = 0,
                          interpret: Optional[bool] = None
                          ) -> BucketedRebuildPipeline:
    """Build the bucketed rebuild-adaptive pipeline (module docstring).

    ``settings``: a fixed-rho Settings (tolerances, constraint flags,
    check_termination, relaxation) plus adaptive_rho_min/max bounding the
    bucket span.  ``adaptive_rho``/``adaptive_rho_rebuild`` flags are
    ignored here — this IS the rebuild path.  phase1_iters/phase2_iters
    must be multiples of check_termination.

    Returns a BucketedRebuildPipeline whose ``solve(x0s (B, nx))`` (B a
    multiple of the batch tile) is one jitted device function returning

        (xs (B, N, nx), us (B, N-1, nu), iters (B,), solved (B,),
         rho (B,), overflow (G,))

    with reference solution semantics per lane; ``rho`` is the bucket each
    lane finished on (rho0 where phase 1 already converged) and
    ``overflow[g]`` counts lanes predicted into bucket g that did not fit
    its ``straggler_slots`` (they keep their unconverged phase-1 state —
    the reference's best-so-far contract, admm.cpp:202-206).

    Precision staging (perf options): ``phase1_bf16`` runs phase 1 with
    one-pass bf16 matmuls — phase 1 at a mis-set rho0 exists to SHAPE the
    prediction residuals, not to converge, and the residuals feeding the
    controller are O(1e-1..1) where bf16's ~1e-2 iterate noise is
    irrelevant; ``phase2_bf16_iters`` prepends that many bf16 iterations
    to the per-bucket continuation before its HIGHEST finish.  Measured
    NEUTRAL on the B=4096 misset workload (within the run-to-run noise
    band: this pipeline's time is dominated by tile early-exit dynamics
    and the per-bucket slot grid, not MXU pass count — docs/DESIGN.md §5);
    kept for larger batches where the matmul share grows."""
    from ..ops.pallas.condensed_kernel import (FusedCarry,
                                               make_condensed_fused_solver)

    s = settings
    p = problem
    nx, nu, N = p.nx, p.nu, p.N
    su, sx = (N - 1) * nu, N * nx
    ct = s.check_termination
    if ct < 1:
        raise ValueError("the bucketed rebuild pipeline needs "
                         f"check_termination >= 1 (got {ct})")
    for what, iters in (("phase1_iters", phase1_iters),
                        ("phase2_iters", phase2_iters)):
        if iters % ct != 0:
            raise ValueError(f"{what}={iters} must be a multiple of "
                             f"check_termination={ct}")
    if bucket_rhos is None:
        bucket_rhos = default_bucket_rhos(float(s.adaptive_rho_min),
                                          float(s.adaptive_rho_max))
    bucket_rhos = tuple(float(r) for r in bucket_rhos)
    G = len(bucket_rhos)
    L2 = int(straggler_slots)

    dtype = p.A.dtype
    rho0 = jnp.asarray(cache.rho, dtype)
    maps0 = build_condensed(p, cache)
    bcaches = rebuild_bucket_caches(p, cache, bucket_rhos)
    bproblems = stack_instances([p] * G)  # shared problem, per-bucket cache
    bmaps = build_condensed(bproblems, bcaches)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    floor = 128 if not interpret else 8
    if L2 % floor != 0:
        raise ValueError(f"straggler_slots={L2} must be a multiple of the "
                         f"tile floor {floor} (Mosaic lane-block rule)")
    Bt = batch_tile or max(floor, min(2048, 512 if su + sx > 200 else 2048))
    Bt2 = min(Bt, L2)
    if L2 % Bt2 != 0:
        raise ValueError(f"straggler_slots={L2} must be a multiple of the "
                         f"phase-2 tile {Bt2}")

    from ..ops.pallas.condensed_kernel import problem_constraint_kw

    kw = dict(abs_pri_tol=float(s.abs_pri_tol),
              abs_dua_tol=float(s.abs_dua_tol),
              en_state_bound=s.en_state_bound,
              en_input_bound=s.en_input_bound,
              relaxation_alpha=s.relaxation_alpha,
              check_termination=ct,
              interpret=interpret, **problem_constraint_kw(p, s))
    k2 = int(phase2_bf16_iters)
    if k2 % ct != 0:
        raise ValueError(f"phase2_bf16_iters={k2} must be a multiple of "
                         f"check_termination={ct}")
    fn1 = make_condensed_fused_solver(
        nx, nu, N, batch_tile=Bt, max_iter=phase1_iters, carry_out=True,
        precision=(jax.lax.Precision.DEFAULT if phase1_bf16
                   else jax.lax.Precision.HIGHEST), **kw)
    if k2:
        fn2a = make_condensed_fused_solver(
            nx, nu, N, batch_tile=Bt2, max_iter=k2, warm_start=True,
            carry_out=True, num_groups=G,
            precision=jax.lax.Precision.DEFAULT, **kw)
    fn2 = make_condensed_fused_solver(nx, nu, N, batch_tile=Bt2,
                                      max_iter=phase2_iters,
                                      warm_start=True, num_groups=G, **kw)
    bounds = (p.u_min, p.u_max, p.x_min, p.x_max)
    brho = jnp.asarray(bucket_rhos, jnp.float32)

    @jax.jit
    def solve(x0s, lane_mask=None):
        """``lane_mask`` (B,) bool optionally marks real lanes; tile-pad
        lanes (False) never consume phase-2 slots."""
        x0s = x0s.astype(jnp.float32)
        B = x0s.shape[0]
        xs1, us1, it1, ok1, carry = fn1(maps0, cache.rho, *bounds, x0s)
        unconv = ok1 == 0
        if lane_mask is not None:
            unconv = jnp.logical_and(unconv, lane_mask)

        bucket, _rho_pred = predict_rho_bucketed(
            p, s, maps0, carry, x0s, rho0.astype(jnp.float32), bucket_rhos)

        # per-bucket compaction into static slots (lane order preserved
        # within a bucket); pad slots get ZERO carry + x0 instead of
        # re-solving lane 0 so empty tiles exit at the first check
        m = unconv[None, :] & (bucket[None, :] == jnp.arange(G)[:, None])
        idx, counts, valid, overflow = compact_members(m, L2)
        gidx = idx.reshape(-1)                                        # (G*L2,)

        def gather(a):
            return jnp.where(valid[None, :], a[:, gidx], 0.0)

        warm = FusedCarry(*(gather(w) for w in carry))
        x0s2 = jnp.where(valid[:, None], x0s[gidx], 0.0)
        if k2:
            xs2a, us2a, it2a, ok2a, warm = fn2a(bmaps, brho, *bounds, x0s2,
                                                warm)
            xs2, us2, it2b, ok2b = fn2(bmaps, brho, *bounds, x0s2, warm)
            xs2 = jnp.where((ok2a == 1)[:, None, None], xs2a, xs2)
            us2 = jnp.where((ok2a == 1)[:, None, None], us2a, us2)
            it2 = jnp.where(ok2a == 1, it2a, k2 + it2b)
            ok2 = jnp.maximum(ok2a, ok2b)
        else:
            xs2, us2, it2, ok2 = fn2(bmaps, brho, *bounds, x0s2, warm)

        # scatter phase-2 results back (invalid slots dropped)
        safe = jnp.where(valid, gidx, B)
        xs = xs1.at[safe].set(xs2, mode="drop")
        us = us1.at[safe].set(us2, mode="drop")
        iters = it1.at[safe].set(phase1_iters + it2, mode="drop")
        solved = ok1.at[safe].set(ok2, mode="drop")
        lane_rho = jnp.full((B,), jnp.float32(rho0))
        lane_rho = lane_rho.at[safe].set(
            jnp.repeat(brho, L2), mode="drop")
        return xs, us, iters, solved, lane_rho, overflow

    return BucketedRebuildPipeline(solve=solve, bucket_rhos=bucket_rhos,
                                   phase1_iters=phase1_iters,
                                   phase2_iters=phase2_iters,
                                   straggler_slots=L2)
