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

    def solve_batch(self, x0s, *, method: str = "auto"):
        """x0s: (G, L, nx) per-group initial states.  Returns numpy
        (states (G, L, N, nx), controls (G, L, N-1, nu), iters (G, L),
        solved (G, L))."""
        x0s = jnp.asarray(np.asarray(x0s, float), self.problems.A.dtype)
        if x0s.ndim != 3 or x0s.shape[0] != self.num_groups:
            raise ValueError(
                f"x0s must be (G={self.num_groups}, L, nx); got {x0s.shape}")
        if method == "auto":
            from ..ops.condensed import auto_uses_condensed
            # per-group maps: the footprint scales with G
            from ..ops import condensed as _cnd
            fp = _cnd.condensed_footprint_bytes(
                self.nx, self.nu, self.N,
                adaptive=self.settings.adaptive_rho) * self.num_groups
            method = ("condensed"
                      if fp <= _cnd.AUTO_CONDENSED_BUDGET_BYTES
                      else "standard")
        if method == "fused":
            out = self._solve_fused(x0s)
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

    def _solve_fused(self, x0s):
        """The Pallas grouped kernel: per-group T12 blocks over a (G, tiles)
        grid.  Box bounds may vary per group; SOC/linear constraint DATA must
        be shared across groups on this path (selector matrices are baked) —
        per-group constraint data rides method='condensed'."""
        s = self.settings
        p = self.problems
        G, L = int(x0s.shape[0]), int(x0s.shape[1])
        if s.adaptive_rho:
            raise ValueError("grouped fused adaptive-rho is not available; "
                             "use method='condensed' (grouped Taylor maps)")
        ct = s.check_termination
        if ct < 1 or s.max_iter % ct != 0:
            raise ValueError(
                "the fused path needs check_termination >= 1 dividing "
                f"max_iter (got {ct} / {s.max_iter})")

        def shared_rows(a, what):
            a = np.asarray(a)
            if a.ndim >= 1 and a.shape[0] == G:
                if not (a == a[:1]).all():
                    raise ValueError(
                        f"fused grouped path needs {what} shared across "
                        "groups; use method='condensed'")
                a = a[0]
            return a

        soc_u = soc_x = ()
        lin_u = lin_x = None
        if s.en_input_soc or s.en_state_soc:
            def cone_spec(cones):
                mus = shared_rows(cones.mus, "cone coefficients")
                return tuple((int(st), int(dm), float(mu)) for st, dm, mu in
                             zip(cones.starts, cones.dims, mus))
            soc_u = cone_spec(p.cones_u) if s.en_input_soc else ()
            soc_x = cone_spec(p.cones_x) if s.en_state_soc else ()
        if s.en_input_linear:
            lin_u = (shared_rows(p.Alin_u, "Alin_u"),
                     shared_rows(p.blin_u, "blin_u"))
        if s.en_state_linear:
            lin_x = (shared_rows(p.Alin_x, "Alin_x"),
                     shared_rows(p.blin_x, "blin_x"))

        from ..ops import condensed as cnd
        from ..ops.pallas.condensed_kernel import make_condensed_fused_solver
        if self._maps is None:
            self._maps = cnd.build_condensed(p, self.caches)

        sw = self.nx * self.N + self.nu * (self.N - 1)
        Bt = 512 if sw > 200 else 2048
        while Bt > L and Bt > 8:
            Bt //= 2
        Lp = ((L + Bt - 1) // Bt) * Bt
        x0s_p = x0s if Lp == L else jnp.concatenate(
            [x0s, jnp.zeros((G, Lp - L, self.nx), x0s.dtype)], axis=1)
        interpret = jax.default_backend() != "tpu"
        from ..types import settings_bake_key
        key = (settings_bake_key(s), Bt, interpret)
        fn = self._fused_solvers.get(key)
        if fn is None:
            fn = make_condensed_fused_solver(
                self.nx, self.nu, self.N, batch_tile=Bt,
                max_iter=s.max_iter,
                abs_pri_tol=float(s.abs_pri_tol),
                abs_dua_tol=float(s.abs_dua_tol),
                en_state_bound=s.en_state_bound,
                en_input_bound=s.en_input_bound,
                relaxation_alpha=s.relaxation_alpha,
                check_termination=ct,
                soc_u=soc_u, soc_x=soc_x, lin_u=lin_u, lin_x=lin_x,
                num_groups=G, interpret=interpret)
            self._fused_solvers[key] = fn
        xs, us, iters, solved = fn(
            self._maps, self.caches.rho, p.u_min, p.u_max, p.x_min, p.x_max,
            x0s_p.astype(jnp.float32))
        xs = xs.reshape(G, Lp, self.N, self.nx)[:, :L]
        us = us.reshape(G, Lp, self.N - 1, self.nu)[:, :L]
        return (xs, us, iters.reshape(G, Lp)[:, :L],
                solved.reshape(G, Lp)[:, :L])
