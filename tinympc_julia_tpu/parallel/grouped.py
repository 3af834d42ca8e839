"""Grouped (per-instance problem) batch solving: the domain-randomized sweep.

The reference sets up ONE problem per process (the singleton,
/root/reference/src/bindings.cpp:15-18) and re-calls tiny_setup to change
plants (/root/reference/src/codegen_src/tinympc/tiny_api.cpp:21-122).  The
TPU-native sweep workload (BASELINE config: "64k domain-randomized quadrotor
instances") needs G *distinct* plants/costs/bounds solved simultaneously,
each over L initial states, as one compiled program.

`GroupedBatchSolver` is the throughput front-end for that: G-batched
Problem/Cache pytrees in, (G, L)-shaped solutions out, with the same method
ladder as TinyMPCSolver.solve_batch:

  * "standard"  — masked batched ADMM, problems expanded per lane
                  (parallel/batch.py; any constraints, reference-exact)
  * "condensed" — grouped condensed maps (ops/condensed.py), one batched MXU
                  contraction per iteration; adaptive-rho rides the grouped
                  Taylor maps
  * "fused"     — the VMEM-resident Pallas kernel with a group grid
                  dimension (ops/pallas/condensed_kernel.py; float32)
  * "auto"      — condensed

Per-lane semantics of every method match solving each group alone (pinned in
tests/test_condensed_grouped.py / tests/test_grouped_fused.py).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..types import Cache, Problem, Settings


def _warn_short_highest_tail(settings, tail: int):
    """bf16 staging with SOC/halfspace constraints needs a full-precision
    tail of >= ~48 iterations — shorter tails measurably collapse
    convergence on SOC-heavy shapes (18-71%, docs/DESIGN.md §5)."""
    if tail < 48 and (settings.en_input_soc or settings.en_state_soc
                      or settings.en_input_linear
                      or settings.en_state_linear):
        import warnings
        warnings.warn(
            f"bf16 staging leaves only {tail} full-precision iterations on "
            "a SOC/halfspace-constrained problem — measured to collapse "
            "convergence below ~48 (docs/DESIGN.md §5); shrink the bf16 "
            "head or raise the iteration budget", stacklevel=3)


def stack_instances(items: Sequence):
    """Stack a list of identically-shaped pytrees (Problems, Caches, ...)
    into one pytree with a leading group axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *items)


def expand_lanes(tree, L: int):
    """(G, ...) pytree -> (G*L, ...) per-lane pytree (lane = g*L + l)."""
    return jax.tree_util.tree_map(lambda a: jnp.repeat(a, L, axis=0), tree)


class GroupedBatchSolver:
    """Batched solves over G distinct problems x L lanes each.

    ``problems``/``caches`` are G-leading batched pytrees (build them with
    ``stack_instances`` from per-instance ``make_problem``/
    ``precompute_cache`` results, or construct the batched leaves directly).
    """

    def __init__(self, problems: Problem, caches: Cache,
                 settings: Optional[Settings] = None):
        if problems.A.ndim != 3:
            raise ValueError("problems must carry a leading group axis; "
                             "stack per-instance Problems with "
                             "stack_instances()")
        self.problems = problems
        self.caches = caches
        self.settings = settings if settings is not None else Settings()
        self.num_groups = problems.A.shape[0]
        self._maps = None
        self._taylor_maps = None
        self._fused_solvers = {}
        self._pipelines = {}
        # per-group straggler-slot overflow counts of the last
        # solve_batch(pipeline=...) call (None before any)
        self.last_overflow = None

    @property
    def nx(self) -> int:
        return self.problems.A.shape[-1]

    @property
    def nu(self) -> int:
        return self.problems.B.shape[-1]

    @property
    def N(self) -> int:
        return self.problems.Xref.shape[-2]

    # -- solve ---------------------------------------------------------------

    def solve_batch(self, x0s, *, method: str = "auto", pipeline=None):
        """x0s: (G, L, nx) per-group initial states.  Returns numpy
        (states (G, L, N, nx), controls (G, L, N-1, nu), iters (G, L),
        solved (G, L)).

        ``pipeline=(phase1_iters, straggler_slots, phase2_iters)`` routes the
        fused method through the two-phase straggler pipeline
        (make_fused_pipeline) — same per-lane semantics as a single fused
        solve of phase1+phase2 iterations.  A dict form reaches every
        make_fused_pipeline option, e.g.
        ``pipeline=dict(phase1_iters=100, straggler_slots=256,
        phase2_iters=1500, phase0_bf16_iters=128, phase2_bf16_head=512)``
        (the precision-staged configuration).  Groups with more unconverged
        lanes than ``straggler_slots`` leave the overflow in its phase-1
        state; the per-group overflow counts of the last pipeline solve are
        exposed as ``self.last_overflow`` (a UserWarning fires when any are
        nonzero)."""
        x0s = jnp.asarray(np.asarray(x0s, float), self.problems.A.dtype)
        if x0s.ndim != 3 or x0s.shape[0] != self.num_groups:
            raise ValueError(
                f"x0s must be (G={self.num_groups}, L, nx); got {x0s.shape}")
        if (self.settings.adaptive_rho and self.settings.adaptive_rho_rebuild
                and method != "standard"):
            raise ValueError(
                "adaptive_rho_rebuild on the grouped condensed/fused paths "
                "is not supported (the Taylor maps would go stale); use "
                "method='standard', or the bucketed rebuild pipeline "
                "(api.TinyMPCSolver.solve_batch_rebuild_adaptive) for "
                "shared-problem batches")
        if method == "auto":
            # per-group maps: the footprint scales with G
            from ..ops import condensed as _cnd
            fp = _cnd.condensed_footprint_bytes(
                self.nx, self.nu, self.N,
                adaptive=self.settings.adaptive_rho) * self.num_groups
            method = ("condensed"
                      if fp <= _cnd.AUTO_CONDENSED_BUDGET_BYTES
                      else "standard")
        if method == "fused":
            if pipeline is not None:
                if isinstance(pipeline, dict):
                    import inspect
                    pkw = dict(pipeline)
                    slots = pkw.get(
                        "straggler_slots",
                        inspect.signature(self.make_fused_pipeline)
                        .parameters["straggler_slots"].default)
                else:
                    mi1, slots, mi2 = pipeline
                    pkw = dict(phase1_iters=mi1, straggler_slots=slots,
                               phase2_iters=mi2)
                # pad lanes up to a tile multiple (same padding the plain
                # fused path applies); pad lanes are masked out of straggler
                # selection (valid_lanes) and sliced off the outputs
                L = int(x0s.shape[1])
                Bt = pkw.pop("batch_tile", None) or self._default_tile(L)
                Lp = ((L + Bt - 1) // Bt) * Bt
                x0s_p = x0s if Lp == L else jnp.concatenate(
                    [x0s, jnp.zeros((self.num_groups, Lp - L, self.nx),
                                    x0s.dtype)], axis=1)
                fn = self.make_fused_pipeline(
                    lanes=Lp, batch_tile=Bt, valid_lanes=L, **pkw)
                *out, overflow = fn(x0s_p)
                out = tuple(o[:, :L] for o in out)
                self.last_overflow = np.asarray(overflow)
                if self.last_overflow.any():
                    import warnings
                    warnings.warn(
                        f"fused pipeline straggler_slots={slots} too small: "
                        f"per-group overflow {self.last_overflow.tolist()} "
                        "lanes kept their unconverged phase-1 state",
                        stacklevel=2)
            else:
                out = self._solve_fused(x0s)
        elif pipeline is not None:
            raise ValueError("pipeline= is only available with "
                             "method='fused'")
        elif method == "condensed":
            from ..ops import condensed as cnd
            if self.settings.adaptive_rho:
                if self._taylor_maps is None:
                    self._taylor_maps = cnd.build_condensed_taylor(
                        self.problems, self.caches)
                out = cnd.solve_condensed_adaptive_grouped(
                    self.problems, self.caches, self.settings, x0s,
                    self._taylor_maps)
            else:
                if self._maps is None:
                    self._maps = cnd.build_condensed(self.problems,
                                                     self.caches)
                out = cnd.solve_condensed_grouped(
                    self.problems, self.caches, self.settings, x0s,
                    self._maps)
        elif method == "standard":
            from .. import types as T
            from . import batch as batch_mod
            G, L = x0s.shape[0], x0s.shape[1]
            lane_p = expand_lanes(self.problems, L)
            lane_c = expand_lanes(self.caches, L)
            st = batch_mod.set_x0_batch(
                batch_mod.broadcast_state(
                    T.init_state(self.nx, self.nu, self.N,
                                 self.problems.A.dtype), G * L),
                x0s.reshape(G * L, self.nx))
            _, _, sol = batch_mod.solve_batch(
                lane_p, lane_c, self.settings, st,
                problem_batched=True, cache_batched=True)
            out = (sol.x.reshape(G, L, self.N, self.nx),
                   sol.u.reshape(G, L, self.N - 1, self.nu),
                   sol.iter.reshape(G, L), sol.solved.reshape(G, L))
        else:
            raise ValueError(f"unknown method: {method}")
        return tuple(np.asarray(o) for o in out)

    def _fused_constraint_spec(self):
        """Constraint data for the fused kernel.  STRUCTURE (cone
        starts/dims, halfspace row counts) is shared across groups by
        construction (static ConeSet metadata); DATA — cone mus, halfspace
        a/b rows — may vary per group and rides the kernel's group grid
        (condensed_kernel.py stacks per-row selector matrices along G and
        passes mu/b as group-indexed inputs)."""
        s = self.settings
        p = self.problems

        soc_u = soc_x = ()
        lin_u = lin_x = None
        if s.en_input_soc or s.en_state_soc:
            def cone_spec(cones):
                mus = np.asarray(cones.mus)  # (G, C) grouped or (C,) shared
                return tuple((int(st), int(dm), mus[..., k])
                             for k, (st, dm) in enumerate(
                                 zip(cones.starts, cones.dims)))
            soc_u = cone_spec(p.cones_u) if s.en_input_soc else ()
            soc_x = cone_spec(p.cones_x) if s.en_state_soc else ()
        if s.en_input_linear:
            lin_u = (np.asarray(p.Alin_u), np.asarray(p.blin_u))
        if s.en_state_linear:
            lin_x = (np.asarray(p.Alin_x), np.asarray(p.blin_x))
        return soc_u, soc_x, lin_u, lin_x

    def _fused_kernel(self, Bt, max_iter, **extra):
        """Build (and cache) one grouped fused kernel config."""
        s = self.settings
        from ..ops import condensed as cnd
        from ..ops.pallas.condensed_kernel import make_condensed_fused_solver
        from ..types import settings_bake_key
        if self._maps is None:
            self._maps = cnd.build_condensed(self.problems, self.caches)
        soc_u, soc_x, lin_u, lin_x = self._fused_constraint_spec()
        interpret = jax.default_backend() != "tpu"
        key = (settings_bake_key(s), Bt, max_iter, interpret,
               tuple(sorted(extra.items())))
        fn = self._fused_solvers.get(key)
        if fn is None:
            kwargs = dict(
                batch_tile=Bt, max_iter=max_iter,
                abs_pri_tol=float(s.abs_pri_tol),
                abs_dua_tol=float(s.abs_dua_tol),
                en_state_bound=s.en_state_bound,
                en_input_bound=s.en_input_bound,
                relaxation_alpha=s.relaxation_alpha,
                check_termination=s.check_termination,
                soc_u=soc_u, soc_x=soc_x, lin_u=lin_u, lin_x=lin_x,
                num_groups=self.num_groups, interpret=interpret)
            kwargs.update(extra)  # extra may override (e.g. ct in phase 0)
            fn = make_condensed_fused_solver(self.nx, self.nu, self.N,
                                             **kwargs)
            self._fused_solvers[key] = fn
        return fn

    def _adaptive_fused_kernel(self, Bt, max_iter, **extra):
        """Build (and cache) one grouped ADAPTIVE fused kernel config (the
        per-lane-rho Taylor kernel with a group grid,
        ops/pallas/adaptive_kernel.py).  Full constraint stack: per-group
        SOC/halfspace data rides the group grid exactly like the fixed-rho
        kernel."""
        s = self.settings
        from ..ops import condensed as cnd
        from ..ops.pallas.adaptive_kernel import (
            make_condensed_adaptive_fused_solver)
        from ..types import settings_bake_key
        if self._taylor_maps is None:
            self._taylor_maps = cnd.build_condensed_taylor(self.problems,
                                                           self.caches)
        soc_u, soc_x, lin_u, lin_x = self._fused_constraint_spec()
        interpret = jax.default_backend() != "tpu"
        key = ("adaptive", settings_bake_key(s), Bt, max_iter, interpret,
               tuple(sorted(extra.items())))
        fn = self._fused_solvers.get(key)
        if fn is None:
            fn = make_condensed_adaptive_fused_solver(
                np.asarray(self.problems.A), np.asarray(self.problems.B),
                np.asarray(self.problems.Q), np.asarray(self.problems.R),
                np.asarray(self.caches.Pinf),
                np.asarray(self.caches.dPinf_drho),
                self.N, batch_tile=Bt, max_iter=max_iter,
                abs_pri_tol=float(s.abs_pri_tol),
                abs_dua_tol=float(s.abs_dua_tol),
                en_state_bound=s.en_state_bound,
                en_input_bound=s.en_input_bound,
                relaxation_alpha=s.relaxation_alpha,
                adaptive_rho_min=float(s.adaptive_rho_min),
                adaptive_rho_max=float(s.adaptive_rho_max),
                adaptive_rho_clipping=s.adaptive_rho_enable_clipping,
                check_termination=s.check_termination,
                controller=s.adaptive_rho_controller,
                taylor_trust=float(s.adaptive_rho_taylor_trust),
                soc_u=soc_u, soc_x=soc_x, lin_u=lin_u, lin_x=lin_x,
                num_groups=self.num_groups, interpret=interpret, **extra)
            self._fused_solvers[key] = fn
        return fn

    def _check_fused_settings(self):
        s = self.settings
        ct = s.check_termination
        if ct < 1 or s.max_iter % ct != 0:
            raise ValueError(
                "the fused path needs check_termination >= 1 dividing "
                f"max_iter (got {ct} / {s.max_iter})")
        if s.adaptive_rho:
            import math as _math
            step = _math.lcm(5, ct)
            if s.max_iter % step != 0:
                raise ValueError(
                    "the fused adaptive path needs max_iter divisible by "
                    f"lcm(check_termination, 5) = {step} (the rho update "
                    f"interval; got max_iter={s.max_iter})")

    def _default_tile(self, L):
        sw = self.nx * self.N + self.nu * (self.N - 1)
        Bt = 512 if sw > 200 else 2048
        # Mosaic requires the lane (last) block dimension be a multiple of
        # 128 unless the block spans the whole array — so on real TPU the
        # tile floor is 128 (lanes pad up); tiny tiles are interpret-only.
        floor = 128 if jax.default_backend() == "tpu" else 8
        while Bt > L and Bt > floor:
            Bt //= 2
        return max(Bt, floor) if jax.default_backend() == "tpu" else Bt

    def _solve_fused(self, x0s):
        """The Pallas grouped kernel: per-group T12 blocks over a (G, tiles)
        grid.  Box bounds / SOC mus / halfspace rows may vary per group;
        with adaptive_rho the grouped ADAPTIVE kernel runs per-lane rho on
        per-group Taylor maps (box constraints only)."""
        s = self.settings
        p = self.problems
        G, L = int(x0s.shape[0]), int(x0s.shape[1])
        self._check_fused_settings()
        Bt = self._default_tile(L)
        Lp = ((L + Bt - 1) // Bt) * Bt
        x0s_p = x0s if Lp == L else jnp.concatenate(
            [x0s, jnp.zeros((G, Lp - L, self.nx), x0s.dtype)], axis=1)
        if s.adaptive_rho:
            if s.bf16_head_iters:
                raise ValueError("bf16_head_iters is fixed-rho only (the "
                                 "rho prediction would read bf16-noise "
                                 "residuals)")
            fn = self._adaptive_fused_kernel(Bt, s.max_iter)
            xs, us, iters, solved, _rho = fn(
                self._taylor_maps, p.u_min, p.u_max, p.x_min, p.x_max,
                x0s_p.astype(jnp.float32))
        else:
            extra = {}
            if s.bf16_head_iters:
                _warn_short_highest_tail(s, s.max_iter - s.bf16_head_iters)
                extra["bf16_head_iters"] = s.bf16_head_iters
            fn = self._fused_kernel(Bt, s.max_iter, **extra)
            xs, us, iters, solved = fn(
                self._maps, self.caches.rho, p.u_min, p.u_max, p.x_min,
                p.x_max, x0s_p.astype(jnp.float32))
        xs = xs.reshape(G, Lp, self.N, self.nx)[:, :L]
        us = us.reshape(G, Lp, self.N - 1, self.nu)[:, :L]
        return (xs, us, iters.reshape(G, Lp)[:, :L],
                solved.reshape(G, Lp)[:, :L])

    def make_fused_pipeline(self, *, phase1_iters: int = 100,
                            straggler_slots: int = 256,
                            phase2_iters: int = 300, lanes: int,
                            batch_tile: Optional[int] = None,
                            valid_lanes: Optional[int] = None,
                            phase0_bf16_iters: int = 0,
                            phase2_bf16_head: int = 0):
        """Two-phase grouped fused solve as ONE jitted device function.

        A VMEM-resident tile runs until its SLOWEST lane converges, so a
        single long solve wastes most of its iterations re-running converged
        lanes (measured: ~4% useful at max_iter=300 on the randomized
        quadrotor sweep).  The pipeline does a bulk pass of ``phase1_iters``,
        compacts each group's unconverged lanes into ``straggler_slots``
        per-group slots (per-group compaction keeps every lane aligned with
        its group's T12 block), and CONTINUES them warm from their phase-1
        carry for up to ``phase2_iters`` more — an exact continuation, so
        per-lane results equal a single solve of phase1+phase2 iterations
        (pinned in tests/test_grouped_fused.py).

        Returns a jitted ``pipeline(x0s) -> (xs, us, iters, solved,
        overflow)`` over (G, lanes, nx) float32 x0s with device-resident
        outputs in the same shapes/semantics as solve_batch (iters for
        phase-2 lanes = phase1_iters + continuation iterations).  If a group
        has more than ``straggler_slots`` stragglers the overflow keeps its
        (unconverged) phase-1 state; ``overflow`` is the per-group (G,)
        int32 count of such lanes — nonzero means ``straggler_slots`` was
        too small (the analog of the reference's best-so-far-on-exhaustion
        contract, admm.cpp:202-206, made visible).

        ``valid_lanes`` (default: all) marks only the first ``valid_lanes``
        lanes of each group as real; pad lanes beyond it (tile-padding added
        by solve_batch) are excluded from straggler selection so they cannot
        displace real unconverged lanes from phase 2.

        ``phase0_bf16_iters`` (fixed-rho pipelines only) prepends a
        precision-staged bulk phase running that many iterations with
        one-pass bf16 matmuls (Precision.DEFAULT) before the HIGHEST
        phases — bf16 noise stalls ADMM at ~1e-2, but driving iterates
        into that ball costs 1/6th the MXU passes (measured +14% on the
        headline pipeline, docs/DESIGN.md §5).  ``phase2_bf16_head``
        (fixed-rho only) gives the straggler continuation an in-kernel
        bf16 head of that many iterations (condensed_kernel
        bf16_head_iters) — the BIGGEST staging lever on straggler-heavy
        sweeps, since stragglers are exactly the lanes with hundreds of
        iterations left (measured +56% on the randomized quadrotor sweep
        at 100% convergence).  Both are perf configurations: the
        exact-continuation equivalence to a single long HIGHEST solve no
        longer holds bit-for-bit (solution QUALITY is unchanged — the
        termination check always evaluates true 1e-3 residuals on the
        actual iterates).
        """
        s = self.settings
        p = self.problems
        G, L, nx = self.num_groups, int(lanes), self.nx
        L2 = int(straggler_slots)
        # the pipeline's budgets are phase1/phase2_iters — s.max_iter is
        # irrelevant here, so validate ct + the phase budgets directly
        ct = s.check_termination
        if ct < 1:
            raise ValueError("the fused pipeline needs "
                             f"check_termination >= 1 (got {ct})")
        for what, iters in (("phase1_iters", phase1_iters),
                            ("phase2_iters", phase2_iters)):
            if iters % ct != 0:
                raise ValueError(
                    f"{what}={iters} must be a multiple of "
                    f"check_termination={ct} (the exact-continuation "
                    "guarantee needs phase boundaries on check iterations)")
        Bt = batch_tile or self._default_tile(L)
        if L % Bt != 0:
            raise ValueError(f"lanes={L} must be a multiple of the batch "
                             f"tile {Bt} (pad x0s)")
        Bt2 = L2 if L2 <= 512 else 512
        if L2 % Bt2 != 0:
            raise ValueError(f"straggler_slots={L2} must be a multiple "
                             f"of {Bt2}")
        Lv = L if valid_lanes is None else int(valid_lanes)
        if not 0 < Lv <= L:
            raise ValueError(f"valid_lanes={Lv} must be in (0, lanes={L}]")
        k0 = int(phase0_bf16_iters)
        k2 = int(phase2_bf16_head)
        if (k0 or k2) and s.adaptive_rho:
            raise ValueError("phase0_bf16_iters/phase2_bf16_head are "
                             "fixed-rho only (the rho prediction would read "
                             "bf16-noise residuals)")
        if k0 % ct != 0:
            raise ValueError(f"phase0_bf16_iters={k0} must be a multiple of "
                             f"check_termination={ct}")
        if k2 and (k2 % ct != 0 or k2 >= phase2_iters):
            raise ValueError(
                f"phase2_bf16_head={k2} must be a multiple of "
                f"check_termination={ct} below phase2_iters={phase2_iters}")
        if k2:
            _warn_short_highest_tail(s, phase2_iters - k2)
        from ..types import settings_bake_key
        pkey = (settings_bake_key(s), phase1_iters, L2, phase2_iters, L, Bt,
                Lv, k0, k2)
        cached = self._pipelines.get(pkey)
        if cached is not None:
            return cached
        adaptive = s.adaptive_rho
        if adaptive:
            fn1 = self._adaptive_fused_kernel(Bt, phase1_iters,
                                              carry_out=True)
            fn2 = self._adaptive_fused_kernel(Bt2, phase2_iters,
                                              warm_start=True)
            tmaps = self._taylor_maps
        else:
            if k0:
                # phase 0 keeps the Settings check cadence: on the
                # domain-randomized sweeps easy TILES converge well inside
                # the bf16 budget and early-exit — measured worth more
                # than stripping the residual block (the headline's
                # homogeneous cartpole distribution is the opposite case
                # and uses an end-check-only phase 0; docs/DESIGN.md §5)
                fn0 = self._fused_kernel(
                    Bt, k0, carry_out=True,
                    precision=jax.lax.Precision.DEFAULT)
                fn1 = self._fused_kernel(Bt, phase1_iters, warm_start=True,
                                         carry_out=True)
            else:
                fn1 = self._fused_kernel(Bt, phase1_iters, carry_out=True)
            extra2 = dict(warm_start=True)
            if k2:
                extra2["bf16_head_iters"] = k2
            fn2 = self._fused_kernel(Bt2, phase2_iters, **extra2)
            maps, rho = self._maps, self.caches.rho
        bounds = (p.u_min, p.u_max, p.x_min, p.x_max)

        @jax.jit
        def pipeline(x0s):
            x0s = x0s.astype(jnp.float32)
            if adaptive:
                xs1, us1, it1, ok1, _rho1, carry = fn1(tmaps, *bounds, x0s)
            elif k0:
                xs0, us0, it0, ok0, carry0 = fn0(maps, rho, *bounds, x0s)
                xs1, us1, it1, ok1, carry = fn1(maps, rho, *bounds, x0s,
                                                carry0)
                # lanes that passed the (true-residual) check in the bf16
                # phase latched genuinely-converged iterates there
                xs1 = jnp.where((ok0 == 1)[:, None, None], xs0, xs1)
                us1 = jnp.where((ok0 == 1)[:, None, None], us0, us1)
                it1 = jnp.where(ok0 == 1, it0, k0 + it1)
                ok1 = jnp.maximum(ok0, ok1)
            else:
                xs1, us1, it1, ok1, carry = fn1(maps, rho, *bounds, x0s)
            unconv = (ok1 == 0).reshape(G, L)
            if Lv < L:
                # tile-pad lanes are not real work: never spend phase-2
                # slots on them
                unconv = jnp.logical_and(
                    unconv, (jnp.arange(L) < Lv)[None, :])
            from .rebuild import compact_members
            idx, counts, valid, overflow = compact_members(unconv, L2)
            gidx = (idx + jnp.arange(G)[:, None] * L).reshape(-1)
            warm = type(carry)(*(w[:, gidx] for w in carry))
            x0s2 = x0s.reshape(G * L, nx)[gidx].reshape(G, L2, nx)
            if adaptive:
                xs2, us2, it2, ok2, _rho2 = fn2(tmaps, *bounds, x0s2, warm)
            else:
                xs2, us2, it2, ok2 = fn2(maps, rho, *bounds, x0s2, warm)
            # slots beyond the group's straggler count are index-0 fill
            # lanes: drop their writes (out-of-range scatter index)
            safe = jnp.where(valid, gidx, G * L)
            xs = xs1.at[safe].set(xs2, mode="drop")
            us = us1.at[safe].set(us2, mode="drop")
            iters = it1.at[safe].set(k0 + phase1_iters + it2, mode="drop")
            solved = ok1.at[safe].set(ok2, mode="drop")
            return (xs.reshape(G, L, self.N, nx),
                    us.reshape(G, L, self.N - 1, self.nu),
                    iters.reshape(G, L), solved.reshape(G, L), overflow)

        self._pipelines[pkey] = pipeline
        return pipeline
