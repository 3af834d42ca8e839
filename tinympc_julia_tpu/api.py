"""User-facing solver API mirroring the reference Julia surface.

Method-for-method analog of module TinyMPC (/root/reference/src/TinyMPC.jl:3-6):
setup, solve, get_solution, set_x0/x_ref/u_ref, set_bound/linear/cone/equality
constraints, update_settings, set_cache_terms, compute_sensitivity_autograd,
codegen, codegen_with_sensitivity, print_problem_data.

Unlike the reference's process-wide C++ singleton
(/root/reference/src/bindings.cpp:15-18), every `TinyMPCSolver` instance owns
its own immutable pytree state — any number of solvers coexist, and the pytrees
can be checkpointed, vmapped or shipped to a device mesh directly.

Matrix layout at this boundary follows the reference: states are (nx, N),
controls are (nu, N-1), column i = stage i.  Internally everything is
horizon-major (N, nx) — see types.py.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import types as T
from .ops import admm, riccati


class MPCSolution(NamedTuple):
    states: np.ndarray  # (nx, N)
    controls: np.ndarray  # (nu, N-1)


@dataclasses.dataclass
class BatchWarmCarry:
    """Opaque warm-start carry returned by ``solve_batch(return_carry=True)``
    and accepted back as ``warm=``.  Holds the method-specific device-side
    carry (the batched analog of the reference's persistent workspace,
    SURVEY.md §5.4); on the condensed/fused paths a warm continuation is an
    EXACT continuation — two chained calls reproduce one long solve
    lane-for-lane (pinned in tests/test_api_warm.py)."""
    method: str
    batch: int
    data: object


def _default_dtype():
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


class TinyMPCSolver:
    """Stateful convenience wrapper over the pure-functional core.

    Example (mirrors /root/reference/src/TinyMPC.jl:26-31):
        solver = TinyMPCSolver()
        solver.setup(A, B, f, Q, R, rho, nx, nu, N)
        solver.set_x0(x0)
        solver.solve()
        solution = solver.get_solution()
    """

    def __init__(self, dtype=None):
        self.dtype = dtype or _default_dtype()
        self.problem: Optional[T.Problem] = None
        self.cache: Optional[T.Cache] = None
        self.settings: T.Settings = T.default_settings()
        self.state: Optional[T.State] = None
        self.solution: Optional[T.Solution] = None
        self.is_setup = False
        self.horizon_parallel = False
        # Mirrors of the user-supplied data for sensitivity / codegen paths.
        self._user = {}
        self._condensed_maps = None
        self._condensed_taylor_maps = None
        self._chunk_maps = None
        self._fused_solvers = {}
        # per-bucket straggler-slot overflow of the last bucketed-rebuild
        # solve (None before any)
        self.last_overflow = None

    # -- setup --------------------------------------------------------------

    def setup(self, A, B, f, Q, R, rho, nx=None, nu=None, N=None, *,
              verbose=False, abs_pri_tol=1e-3, abs_dua_tol=1e-3,
              max_iter=100, check_termination=True,
              adaptive_rho=False, adaptive_rho_min=0.1, adaptive_rho_max=10.0,
              adaptive_rho_clipping=True):
        """Problem construction + Riccati cache precompute.

        Signature and defaults mirror `setup` (/root/reference/src/TinyMPC.jl:55-61);
        like the Julia wrapper, all constraint-enable flags start disabled and
        are auto-enabled by the constraint setters
        (/root/reference/src/TinyMPC.jl:89-104, bindings.cpp:400-404)."""
        dt = self.dtype
        A = np.asarray(A, float)
        B = np.asarray(B, float)
        nx = nx or A.shape[0]
        nu = nu or B.shape[1]
        if N is None:
            raise ValueError("horizon length N is required")
        if A.shape != (nx, nx):
            raise ValueError(f"A has shape {A.shape}, expected ({nx}, {nx})")
        if B.shape != (nx, nu):
            raise ValueError(f"B has shape {B.shape}, expected ({nx}, {nu})")
        Qm = np.asarray(Q, float)
        Rm = np.asarray(R, float)
        if Qm.shape not in ((nx, nx), (nx,)):
            raise ValueError(f"Q has shape {Qm.shape}, expected ({nx}, {nx})")
        if Rm.shape not in ((nu, nu), (nu,)):
            raise ValueError(f"R has shape {Rm.shape}, expected ({nu}, {nu})")
        f = np.zeros(nx) if f is None else np.asarray(f, float).reshape(nx)

        self._user = dict(A=A, B=B, Q=Qm if Qm.ndim == 2 else np.diag(Qm),
                          R=Rm if Rm.ndim == 2 else np.diag(Rm),
                          f=f, rho=float(rho), nx=nx, nu=nu, N=N)

        self.problem = T.make_problem(
            jnp.asarray(A, dt), jnp.asarray(B, dt), jnp.asarray(Qm, dt),
            jnp.asarray(Rm, dt), jnp.asarray(rho, dt), N,
            f=jnp.asarray(f, dt))
        self.cache = riccati.precompute_cache(
            self.problem.A, self.problem.B, self.problem.Q, self.problem.R,
            jnp.asarray(rho, dt))
        self.settings = T.Settings(
            abs_pri_tol=float(abs_pri_tol), abs_dua_tol=float(abs_dua_tol),
            max_iter=int(max_iter),
            check_termination=int(check_termination),
            en_state_bound=False, en_input_bound=False,
            en_state_soc=False, en_input_soc=False,
            en_state_linear=False, en_input_linear=False,
            adaptive_rho=bool(adaptive_rho),
            adaptive_rho_min=float(adaptive_rho_min),
            adaptive_rho_max=float(adaptive_rho_max),
            adaptive_rho_enable_clipping=bool(adaptive_rho_clipping),
        )
        self.state = T.init_state(nx, nu, N, dt)
        self.solution = None
        self._condensed_maps = None
        self._condensed_taylor_maps = None
        self._chunk_maps = None
        self._fused_solvers = {}
        self.is_setup = True
        if verbose:
            print(f"TinyMPC solver setup successful (nx={nx}, nu={nu}, N={N})")
        return 0

    def _require_setup(self):
        if not self.is_setup:
            raise RuntimeError("Solver not setup")

    # -- state / reference setters -----------------------------------------

    def set_x0(self, x0, *, verbose=False):
        """work->x.col(0) = x0 (tiny_api.cpp:233-243)."""
        self._require_setup()
        x0 = jnp.asarray(np.asarray(x0, float).reshape(-1), self.dtype)
        if x0.shape[0] != self.problem.nx:
            raise ValueError("x0 is not the correct length")
        self.state = self.state.replace(x=self.state.x.at[0].set(x0))
        return 0

    def set_x_ref(self, x_ref, *, verbose=False):
        """Accepts the reference layout (nx, N) (tiny_api.cpp:245-255)."""
        self._require_setup()
        x_ref = np.asarray(x_ref, float)
        nx, N = self.problem.nx, self.problem.N
        if x_ref.shape != (nx, N):
            raise ValueError(f"x_ref has shape {x_ref.shape}, expected ({nx}, {N})")
        self.problem = self.problem.replace(Xref=jnp.asarray(x_ref.T, self.dtype))
        self._condensed_maps = None
        self._condensed_taylor_maps = None
        self._fused_solvers = {}
        return 0

    def set_u_ref(self, u_ref, *, verbose=False):
        self._require_setup()
        u_ref = np.asarray(u_ref, float)
        nu, N = self.problem.nu, self.problem.N
        if u_ref.shape != (nu, N - 1):
            raise ValueError(f"u_ref has shape {u_ref.shape}, expected ({nu}, {N - 1})")
        self.problem = self.problem.replace(Uref=jnp.asarray(u_ref.T, self.dtype))
        self._condensed_maps = None
        self._condensed_taylor_maps = None
        self._fused_solvers = {}
        return 0

    # -- constraints --------------------------------------------------------

    def set_bound_constraints(self, x_min, x_max, u_min, u_max, *, verbose=False):
        """Box bounds in reference layout (nx, N) / (nu, N-1); auto-enables the
        bound flags (bindings.cpp:378-411)."""
        self._require_setup()
        nx, nu, N = self.problem.nx, self.problem.nu, self.problem.N
        x_min = np.broadcast_to(np.asarray(x_min, float), (nx, N))
        x_max = np.broadcast_to(np.asarray(x_max, float), (nx, N))
        u_min = np.broadcast_to(np.asarray(u_min, float), (nu, N - 1))
        u_max = np.broadcast_to(np.asarray(u_max, float), (nu, N - 1))
        dt = self.dtype
        self.problem = self.problem.replace(
            x_min=jnp.asarray(x_min.T, dt), x_max=jnp.asarray(x_max.T, dt),
            u_min=jnp.asarray(u_min.T, dt), u_max=jnp.asarray(u_max.T, dt))
        self.settings = self.settings.replace(en_state_bound=True,
                                              en_input_bound=True)
        return 0

    def set_linear_constraints(self, Alin_x, blin_x, Alin_u, blin_u, *,
                               verbose=False):
        """Per-stage halfspaces Alin_x x <= blin_x, Alin_u u <= blin_u;
        auto-enables flags iff rows > 0 (bindings.cpp:414-450)."""
        self._require_setup()
        dt = self.dtype
        Alin_x = np.asarray(Alin_x, float).reshape(-1, self.problem.nx)
        Alin_u = np.asarray(Alin_u, float).reshape(-1, self.problem.nu)
        blin_x = np.asarray(blin_x, float).reshape(-1)
        blin_u = np.asarray(blin_u, float).reshape(-1)
        self.problem = self.problem.replace(
            Alin_x=jnp.asarray(Alin_x, dt), blin_x=jnp.asarray(blin_x, dt),
            Alin_u=jnp.asarray(Alin_u, dt), blin_u=jnp.asarray(blin_u, dt))
        self.settings = self.settings.replace(
            en_state_linear=self.settings.en_state_linear or Alin_x.shape[0] > 0,
            en_input_linear=self.settings.en_input_linear or Alin_u.shape[0] > 0)
        return 0

    def set_cone_constraints(self, Acu, qcu, cu, Acx, qcx, cx, *, verbose=False):
        """SOC constraints: arrays of start index, cone dim, coefficient mu,
        inputs first then states — the binding signature
        (bindings.cpp:453-490); semantics fixed by the rocket example
        (‖w[start:start+q-1]‖ <= mu * w[start+q-1]).  Auto-enables iff
        non-empty."""
        self._require_setup()
        dt = self.dtype
        cones_u = T.ConeSet(mus=jnp.asarray(np.asarray(cu, float), dt),
                            starts=tuple(int(i) for i in np.asarray(Acu)),
                            dims=tuple(int(i) for i in np.asarray(qcu)))
        cones_x = T.ConeSet(mus=jnp.asarray(np.asarray(cx, float), dt),
                            starts=tuple(int(i) for i in np.asarray(Acx)),
                            dims=tuple(int(i) for i in np.asarray(qcx)))
        self.problem = self.problem.replace(cones_u=cones_u, cones_x=cones_x)
        self.settings = self.settings.replace(
            en_input_soc=self.settings.en_input_soc or cones_u.num_cones > 0,
            en_state_soc=self.settings.en_state_soc or cones_x.num_cones > 0)
        return 0

    def set_equality_constraints(self, Aeq_x, beq_x, Aeq_u=None, beq_u=None):
        """Equalities lowered to inequality pairs, exactly like the Julia layer
        (/root/reference/src/TinyMPC.jl:259-268)."""
        self._require_setup()
        Aeq_x = np.asarray(Aeq_x, float).reshape(-1, self.problem.nx)
        beq_x = np.asarray(beq_x, float).reshape(-1)
        if Aeq_u is None:
            Aeq_u = np.zeros((0, self.problem.nu))
        if beq_u is None:
            beq_u = np.zeros(0)
        Aeq_u = np.asarray(Aeq_u, float).reshape(-1, self.problem.nu)
        beq_u = np.asarray(beq_u, float).reshape(-1)
        return self.set_linear_constraints(
            np.vstack([Aeq_x, -Aeq_x]), np.concatenate([beq_x, -beq_x]),
            np.vstack([Aeq_u, -Aeq_u]), np.concatenate([beq_u, -beq_u]))

    # -- settings / cache ----------------------------------------------------

    def update_settings(self, **kwargs):
        """All 15 settings of the binding (bindings.cpp:336-376).  Accepts the
        Julia keyword names; bools or ints for flags."""
        self._require_setup()
        mapping = dict(
            abs_pri_tol=float, abs_dua_tol=float, max_iter=int,
            check_termination=int, en_state_bound=bool, en_input_bound=bool,
            en_state_soc=bool, en_input_soc=bool, en_state_linear=bool,
            en_input_linear=bool, adaptive_rho=bool, adaptive_rho_min=float,
            adaptive_rho_max=float, adaptive_rho_enable_clipping=bool,
            # framework extensions (Settings docstring / ops/rho.py)
            relaxation_alpha=float,
            adaptive_rho_rebuild=bool,
            adaptive_rho_controller=str,
            adaptive_rho_taylor_trust=float,
            bf16_head_iters=int,
        )
        kwargs.pop("verbose", None)
        # Julia alias used in `setup`
        if "adaptive_rho_clipping" in kwargs:
            kwargs["adaptive_rho_enable_clipping"] = kwargs.pop("adaptive_rho_clipping")
        updates = {}
        for key, value in kwargs.items():
            if key not in mapping:
                raise TypeError(f"unknown setting: {key}")
            updates[key] = mapping[key](value)
        self.settings = self.settings.replace(**updates)
        return 0

    def set_cache_terms(self, Kinf, Pinf, Quu_inv, AmBKt, *, verbose=False):
        """Inject externally computed cache terms, bypassing the Riccati
        precompute (bindings.cpp:262-293; TinyMPC.jl:276-290)."""
        self._require_setup()
        dt = self.dtype
        self.cache = self.cache.replace(
            Kinf=jnp.asarray(np.asarray(Kinf, float), dt),
            Pinf=jnp.asarray(np.asarray(Pinf, float), dt),
            Quu_inv=jnp.asarray(np.asarray(Quu_inv, float), dt),
            AmBKt=jnp.asarray(np.asarray(AmBKt, float), dt))
        self._condensed_maps = None
        self._condensed_taylor_maps = None
        self._chunk_maps = None
        self._fused_solvers = {}
        return 0

    # -- solve ---------------------------------------------------------------

    def solve(self, *, verbose=False, chunked=None):
        """Run ADMM to convergence; persists workspace + cache for warm starts
        (the reference's singleton persistence, SURVEY.md §5.4).  Returns 0 on
        convergence, 1 on max_iter exhaustion (admm.cpp:192,206).

        ``chunked``: None (default) auto-selects the chunked-condensation
        recursions (ops/scans.py) for long horizons where the full condensed
        maps would bust the memory budget — same iterates up to float
        reassociation (a documented deviation from the sequential golden
        path; PARITY.md "Known deviations").  ``False`` forces the exact
        sequential recursions at any horizon; ``True`` forces chunking
        (raises if no chunk size fits)."""
        self._require_setup()
        cm = None
        if chunked is None:
            chunked = (not self.horizon_parallel
                       and not self.settings.adaptive_rho)
            if chunked:
                from .ops.condensed import (auto_chunk_size,
                                            auto_uses_condensed)
                p = self.problem
                chunked = (not auto_uses_condensed(p.nx, p.nu, p.N)
                           and auto_chunk_size(p.nx, p.nu, p.N) is not None)
        if chunked:
            if self.settings.adaptive_rho:
                raise ValueError("chunked solves are incompatible with "
                                 "adaptive_rho (the chunk maps bake the "
                                 "setup-time gains)")
            cm = self._get_chunk_maps()
        self.state, self.cache, self.solution = admm.solve(
            self.problem, self.cache, self.settings, self.state,
            horizon_parallel=self.horizon_parallel, chunk_maps=cm)
        status = 1 - int(self.solution.solved)
        if verbose:
            print(f"Solve completed with status: {status}")
        return status

    def get_solution(self) -> MPCSolution:
        """(states=(nx, N), controls=(nu, N-1)) — the slack iterates, like the
        reference (admm.cpp:187-188; TinyMPC.jl:150-177)."""
        self._require_setup()
        if self.solution is None:
            raise RuntimeError("No solution available; call solve() first")
        return MPCSolution(states=np.asarray(self.solution.x).T,
                           controls=np.asarray(self.solution.u).T)

    def solve_batch(self, x0s, *, method: str = "auto", warm=None,
                    return_carry: bool = False, verbose=False):
        """Batched fresh solves over per-instance initial states.

        x0s: (B, nx).  ``method``:
          * "standard"  — the masked batched ADMM loop (any constraints,
            warm-startable; parallel/batch.py)
          * "condensed" — condensed-iteration fast path (ops/condensed.py)
          * "fused"     — the VMEM-resident Pallas kernel (ops/pallas;
            float32, full box/linear/SOC constraint stack, per-lane
            adaptive-rho; fastest on TPU — the batch is padded to the
            kernel tile)
          * "chunked"   — the standard masked loop with chunked-condensation
            horizon recursions (ops/scans.build_chunk_maps) — the
            long-horizon path beyond the full-condensation budget (same
            iterates up to float reassociation; fixed rho only)
          * "auto"      — condensed while the O((N(nx+nu))^2) maps fit the
            memory budget (ops/condensed.AUTO_CONDENSED_BUDGET_BYTES);
            beyond that, chunked (fixed rho) or standard (adaptive rho).
            Measured (DESIGN.md §3): the condensed solve wins at every
            horizon up to N=1024 on a v5e chip, so the budget — not a perf
            crossover — is the bound.

        Warm starts: pass ``return_carry=True`` to additionally receive an
        opaque ``BatchWarmCarry``, and pass it back as ``warm=`` (same
        method, same batch size) to continue.  On the condensed/fused paths
        this is an EXACT continuation — two chained calls equal one long
        solve lane-for-lane; on the standard path it is the reference's
        persistent-workspace semantics (each call restarts the ADMM loop
        from the carried iterates, SURVEY.md §5.4,
        examples/cartpole_example_mpc.jl:35-51).

        Returns (states (B, N, nx), controls (B, N-1, nu), iters (B,),
        solved (B,)) as numpy arrays, plus the carry when
        ``return_carry=True``.
        """
        self._require_setup()
        import jax.numpy as jnp
        x0s = jnp.asarray(np.asarray(x0s, float), self.dtype)
        B = int(x0s.shape[0])
        if method == "auto":
            from .ops.condensed import auto_chunk_size, auto_uses_condensed
            p = self.problem
            if auto_uses_condensed(p.nx, p.nu, p.N,
                                   adaptive=self.settings.adaptive_rho):
                method = "condensed"
            elif (not self.settings.adaptive_rho
                    and auto_chunk_size(p.nx, p.nu, p.N) is not None):
                # beyond the full-condensation budget: chunked horizon
                # recursions on the standard loop (measured to beat the
                # sequential scan at long N — DESIGN.md §3).  The chunk maps
                # bake the setup-time gains, so adaptive-rho (which moves
                # Kinf) must ride the standard path instead.
                method = "chunked"
            else:
                method = "standard"
        if warm is not None:
            if not isinstance(warm, BatchWarmCarry):
                raise TypeError("warm must be a BatchWarmCarry from a "
                                "previous solve_batch(return_carry=True)")
            if warm.method != method:
                raise ValueError(
                    f"warm carry is for method={warm.method!r}; this solve "
                    f"resolved to {method!r} (method='auto' resolves by the "
                    "condensed-maps budget and the adaptive_rho setting — "
                    "pass the method explicitly to keep a carry valid "
                    "across settings changes)")
            if warm.batch != B:
                raise ValueError(f"warm carry holds {warm.batch} lanes, "
                                 f"x0s has {B}")
        if method == "fused":
            return self._solve_batch_fused(x0s, warm=warm,
                                           return_carry=return_carry)
        if method == "condensed":
            if self.settings.adaptive_rho:
                if self.settings.adaptive_rho_rebuild:
                    raise ValueError(
                        "adaptive_rho_rebuild on the condensed/fused fast "
                        "paths runs as the bucketed rebuild pipeline: use "
                        "solve_batch_rebuild_adaptive (or method='standard' "
                        "for the per-update exact rebuild)")
                # adaptive-rho rides the Taylor-expanded condensed maps
                from .ops.condensed import (build_condensed_taylor,
                                            solve_condensed_adaptive)
                if self._condensed_taylor_maps is None:
                    self._condensed_taylor_maps = build_condensed_taylor(
                        self.problem, self.cache)
                out = solve_condensed_adaptive(
                    self.problem, self.cache, self.settings, x0s,
                    self._condensed_taylor_maps,
                    warm=None if warm is None else warm.data,
                    return_carry=True)
            else:
                from .ops.condensed import build_condensed, solve_condensed
                if self._condensed_maps is None:
                    self._condensed_maps = build_condensed(self.problem,
                                                           self.cache)
                out = solve_condensed(
                    self.problem, self.cache, self.settings, x0s,
                    self._condensed_maps,
                    warm=None if warm is None else warm.data,
                    return_carry=True)
            xs, us, iters, solved, carry = out
        elif method in ("standard", "chunked"):
            from . import types as TT
            from .parallel import batch as batch_mod
            cm = self._get_chunk_maps() if method == "chunked" else None
            if warm is not None:
                st = batch_mod.set_x0_batch(warm.data, x0s)
            else:
                st = batch_mod.set_x0_batch(
                    batch_mod.broadcast_state(
                        TT.init_state(self.problem.nx, self.problem.nu,
                                      self.problem.N, self.dtype), B), x0s)
            st_out, _, sol = batch_mod.solve_batch(self.problem, self.cache,
                                                   self.settings, st,
                                                   chunk_maps=cm)
            xs, us, iters, solved = sol.x, sol.u, sol.iter, sol.solved
            carry = st_out
        else:
            raise ValueError(f"unknown method: {method}")
        res = (np.asarray(xs), np.asarray(us), np.asarray(iters),
               np.asarray(solved))
        if return_carry:
            return res + (BatchWarmCarry(method=method, batch=B, data=carry),)
        return res

    def solve_batch_rebuild_adaptive(self, x0s, *, bucket_rhos=None,
                                     phase1_iters=50, straggler_slots=None,
                                     phase2_iters=500, verbose=False):
        """Batched solves with EXACT adaptive-rho on the fused fast path:
        the bucketed rebuild pipeline (parallel/rebuild.py) — the
        throughput-viable form of the ``adaptive_rho_rebuild`` +
        ``adaptive_rho_controller="termination"`` extension pair, rescuing
        workloads whose setup rho is mis-set by orders of magnitude at
        fused-kernel solve rates.

        Uses the solver's Settings for tolerances / constraint flags /
        check_termination, and [adaptive_rho_min, adaptive_rho_max] as the
        bucket span (pass ``bucket_rhos`` to override the log-spaced
        default).  ``straggler_slots`` (per bucket; default: the padded
        batch size) bounds phase-2 capacity — lanes overflowing a bucket
        keep their unconverged phase-1 state and are counted in
        ``self.last_overflow``.

        Returns (states (B, N, nx), controls (B, N-1, nu), iters (B,),
        solved (B,), rho (B,)) as numpy arrays."""
        self._require_setup()
        from .parallel.rebuild import make_bucketed_rebuild
        x0s = jnp.asarray(np.asarray(x0s, float), jnp.float32)
        B = int(x0s.shape[0])
        interpret = jax.default_backend() != "tpu"
        floor = 128 if not interpret else 8
        p = self.problem
        big = (p.nx * p.N + p.nu * (p.N - 1)) > 200
        Bt = 512 if big else 2048
        while Bt > B and Bt > floor:
            Bt //= 2
        Bp = ((B + Bt - 1) // Bt) * Bt
        if straggler_slots is None:
            straggler_slots = Bp
        # Unlike the other fused paths (bounds/rho are runtime arguments),
        # the rebuild pipeline BAKES problem data and the setup cache into
        # its closure and bucket maps — key on a digest of everything baked
        # so later setter/cache mutations rebuild instead of silently
        # reusing stale data.
        import hashlib
        h = hashlib.sha1()
        for a in (self.cache.rho, self.cache.Kinf, self.cache.Pinf,
                  self.cache.Quu_inv, self.cache.AmBKt, p.A, p.B, p.f,
                  p.Q, p.R, p.rho_setup, p.u_min, p.u_max, p.x_min,
                  p.x_max, p.Xref, p.Uref, p.Alin_u, p.blin_u, p.Alin_x,
                  p.blin_x, p.cones_u.mus, p.cones_x.mus):
            h.update(np.ascontiguousarray(np.asarray(a)).tobytes())
        key = ("rebuild", T.settings_bake_key(self.settings),
               None if bucket_rhos is None else tuple(bucket_rhos),
               phase1_iters, int(straggler_slots), phase2_iters, Bt,
               h.hexdigest())
        pipe = self._fused_solvers.get(key)
        if pipe is None:
            pipe = make_bucketed_rebuild(
                self.problem, self.cache, self.settings,
                bucket_rhos=bucket_rhos, phase1_iters=phase1_iters,
                straggler_slots=int(straggler_slots),
                phase2_iters=phase2_iters, batch_tile=Bt,
                interpret=interpret)
            self._fused_solvers[key] = pipe
        x0s_p = x0s if Bp == B else jnp.concatenate(
            [x0s, jnp.zeros((Bp - B, p.nx), x0s.dtype)], axis=0)
        mask = None if Bp == B else jnp.arange(Bp) < B
        xs, us, iters, solved, rho, overflow = pipe.solve(x0s_p, mask)
        self.last_overflow = np.asarray(overflow)
        if verbose or self.last_overflow.any():
            msg = (f"bucketed rebuild: buckets {pipe.bucket_rhos}, overflow "
                   f"{self.last_overflow.tolist()}")
            if self.last_overflow.any():
                import warnings
                warnings.warn("straggler_slots too small: " + msg,
                              stacklevel=2)
            elif verbose:
                print(msg)
        return (np.asarray(xs)[:B], np.asarray(us)[:B],
                np.asarray(iters)[:B], np.asarray(solved)[:B],
                np.asarray(rho)[:B])

    def _get_chunk_maps(self):
        """Build (and cache) the chunked-horizon maps
        (ops/scans.build_chunk_maps) at the auto-selected chunk size."""
        if self._chunk_maps is None:
            from .ops.condensed import auto_chunk_size
            from .ops.scans import build_chunk_maps
            p = self.problem
            C = auto_chunk_size(p.nx, p.nu, p.N)
            if C is None:
                raise ValueError(
                    f"no chunk size >= 2 divides N-1 = {p.N - 1} within the "
                    "chunk-map budget; use method='standard'")
            self._chunk_maps = build_chunk_maps(p, self.cache, C)
        return self._chunk_maps

    def _solve_batch_fused(self, x0s, *, warm=None, return_carry=False):
        """solve_batch(method="fused"): the VMEM-resident Pallas kernels.

        Pads the batch up to the kernel tile and slices results back;
        compiled solvers are cached per (settings, tile, warm/carry flags)
        and invalidated with the condensed maps.  The warm carry holds the
        PADDED kernel-layout arrays (FusedCarry / AdaptiveFusedCarry) — an
        exact continuation of the previous call."""
        s = self.settings
        p = self.problem
        ct = s.check_termination
        if ct < 1 or s.max_iter % ct != 0:
            raise ValueError(
                "the fused path needs check_termination >= 1 dividing "
                f"max_iter (got {ct} / {s.max_iter})")
        if s.adaptive_rho:
            if s.adaptive_rho_rebuild:
                raise ValueError(
                    "adaptive_rho_rebuild on the condensed/fused fast paths "
                    "runs as the bucketed rebuild pipeline: use "
                    "solve_batch_rebuild_adaptive (or method='standard' for "
                    "the per-update exact rebuild)")
            if s.bf16_head_iters:
                raise ValueError("bf16_head_iters is fixed-rho only (the "
                                 "rho prediction would read bf16-noise "
                                 "residuals)")
            import math as _math
            step = _math.lcm(5, ct)
            if s.max_iter % step != 0:
                raise ValueError(
                    "fused adaptive-rho needs max_iter divisible by "
                    f"lcm(check_termination, 5) = {step} (the rho update "
                    f"interval; got max_iter={s.max_iter})")

        B = x0s.shape[0]
        big = (p.nx * p.N + p.nu * (p.N - 1)) > 200
        Bt = 512 if (big or s.adaptive_rho) else 2048
        # Mosaic: lane blocks must be 128-multiples unless the block spans
        # the array — tile floor 128 on real TPU (batch pads up)
        floor = 128 if jax.default_backend() == "tpu" else 8
        while Bt > B and Bt > floor:
            Bt //= 2
        Btot = ((B + Bt - 1) // Bt) * Bt
        x0s_p = x0s if Btot == B else jnp.concatenate(
            [x0s, jnp.zeros((Btot - B, p.nx), x0s.dtype)], axis=0)
        interpret = jax.default_backend() != "tpu"
        warm_start = warm is not None
        from .types import settings_bake_key
        from .ops.pallas import condensed_kernel as _pk
        key = (settings_bake_key(s), Bt, interpret, warm_start, return_carry)
        fn = self._fused_solvers.get(key)

        if s.adaptive_rho:
            from .ops.condensed import build_condensed_taylor
            from .ops.pallas.adaptive_kernel import (
                make_condensed_adaptive_fused_solver)
            if self._condensed_taylor_maps is None:
                self._condensed_taylor_maps = build_condensed_taylor(
                    p, self.cache)
            if fn is None:
                fn = make_condensed_adaptive_fused_solver(
                    np.asarray(p.A), np.asarray(p.B), np.asarray(p.Q),
                    np.asarray(p.R), np.asarray(self.cache.Pinf),
                    np.asarray(self.cache.dPinf_drho), p.N,
                    batch_tile=Bt, max_iter=s.max_iter,
                    abs_pri_tol=float(s.abs_pri_tol),
                    abs_dua_tol=float(s.abs_dua_tol),
                    en_state_bound=s.en_state_bound,
                    en_input_bound=s.en_input_bound,
                    relaxation_alpha=s.relaxation_alpha,
                    adaptive_rho_min=float(s.adaptive_rho_min),
                    adaptive_rho_max=float(s.adaptive_rho_max),
                    adaptive_rho_clipping=s.adaptive_rho_enable_clipping,
                    check_termination=ct,
                    controller=s.adaptive_rho_controller,
                    taylor_trust=float(s.adaptive_rho_taylor_trust),
                    warm_start=warm_start, carry_out=return_carry,
                    interpret=interpret,
                    **_pk.problem_constraint_kw(p, s))
                self._fused_solvers[key] = fn
            a = (self._condensed_taylor_maps, p.u_min, p.u_max, p.x_min,
                 p.x_max, x0s_p)
            if warm_start:
                a = a + (warm.data,)
            out = fn(*a)
            xs, us, iters, solved, _rho = out[:5]
            carry = out[5] if return_carry else None
        else:
            from .ops.condensed import build_condensed
            from .ops.pallas.condensed_kernel import (
                make_condensed_fused_solver)
            if s.bf16_head_iters:
                from .parallel.grouped import _warn_short_highest_tail
                _warn_short_highest_tail(s, s.max_iter - s.bf16_head_iters)
            if self._condensed_maps is None:
                self._condensed_maps = build_condensed(p, self.cache)
            if fn is None:
                fn = make_condensed_fused_solver(
                    p.nx, p.nu, p.N, batch_tile=Bt, max_iter=s.max_iter,
                    abs_pri_tol=float(s.abs_pri_tol),
                    abs_dua_tol=float(s.abs_dua_tol),
                    en_state_bound=s.en_state_bound,
                    en_input_bound=s.en_input_bound,
                    relaxation_alpha=s.relaxation_alpha,
                    check_termination=ct,
                    bf16_head_iters=s.bf16_head_iters,
                    warm_start=warm_start, carry_out=return_carry,
                    interpret=interpret,
                    **_pk.problem_constraint_kw(p, s))
                self._fused_solvers[key] = fn
            a = (self._condensed_maps, self.cache.rho, p.u_min, p.u_max,
                 p.x_min, p.x_max, x0s_p)
            if warm_start:
                a = a + (warm.data,)
            out = fn(*a)
            xs, us, iters, solved = out[:4]
            carry = out[4] if return_carry else None
        res = (np.asarray(xs)[:B], np.asarray(us)[:B],
               np.asarray(iters)[:B], np.asarray(solved)[:B])
        if return_carry:
            return res + (BatchWarmCarry(method="fused", batch=B,
                                         data=carry),)
        return res

    # -- sensitivity ---------------------------------------------------------

    def compute_sensitivity_autograd(self):
        """Exact d/d rho of the Julia-style LQR terms (jacfwd), replacing the
        reference's finite differences (TinyMPC.jl:301-321).  Returns
        (dK, dP, dC1, dC2) as numpy arrays."""
        self._require_setup()
        u = self._user
        dt = self.dtype
        out = riccati.compute_sensitivity_autograd(
            jnp.asarray(u["A"], dt), jnp.asarray(u["B"], dt),
            jnp.asarray(u["Q"], dt), jnp.asarray(u["R"], dt), u["rho"])
        return tuple(np.asarray(m) for m in out)

    # -- diagnostics ---------------------------------------------------------

    def print_problem_data(self, *, verbose=False):
        """Debug dump mirroring print_problem_data (bindings.cpp:228-259)."""
        self._require_setup()
        sol = self.solution
        print("=== TinyMPC Problem Data ===")
        print(f"Solution: iter={0 if sol is None else int(sol.iter)}, "
              f"solved={0 if sol is None else int(sol.solved)}")
        print(f"Cache: rho={float(self.cache.rho)}")
        print(f"Settings: max_iter={self.settings.max_iter}, "
              f"abs_pri_tol={self.settings.abs_pri_tol}, "
              f"abs_dua_tol={self.settings.abs_dua_tol}")
        print(f"Problem: nx={self.problem.nx}, nu={self.problem.nu}")
        if verbose and sol is not None:
            print(f"States x:\n{np.asarray(sol.x).T}")
            print(f"Controls u:\n{np.asarray(sol.u).T}")
            print(f"Cache Kinf:\n{np.asarray(self.cache.Kinf)}")
            print(f"Cache Pinf:\n{np.asarray(self.cache.Pinf)}")
        return 0

    # -- codegen / persistence ----------------------------------------------

    def codegen(self, output_dir, *, verbose=False):
        """Emit a standalone, dependency-free C++ project with the solver state
        baked in (analog of tiny_codegen, codegen.cpp:56-68)."""
        self._require_setup()
        from .codegen import emitter
        emitter.codegen(self, output_dir, verbose=verbose)
        return 0

    def codegen_with_sensitivity(self, output_dir, dK, dP, dC1, dC2, *,
                                 verbose=False):
        """Codegen with explicit sensitivity matrices for adaptive-rho
        (codegen.cpp:79-85): stores them in the cache iff adaptive_rho is
        enabled, then emits."""
        self._require_setup()
        dt = self.dtype
        if self.settings.adaptive_rho:
            self.cache = self.cache.replace(
                dKinf_drho=jnp.asarray(np.asarray(dK, float), dt),
                dPinf_drho=jnp.asarray(np.asarray(dP, float), dt),
                dC1_drho=jnp.asarray(np.asarray(dC1, float), dt),
                dC2_drho=jnp.asarray(np.asarray(dC2, float), dt))
            # the Taylor-expanded condensed maps bake dK/dP — rebuild them
            self._condensed_taylor_maps = None
            self._fused_solvers = {}
        from .codegen import emitter
        emitter.codegen(self, output_dir, verbose=verbose)
        return 0

    def save(self, path):
        """Checkpoint the full solver (problem + cache + settings + workspace)
        — the value-semantics analog of codegen's baked-state serialization
        (SURVEY.md §5.4)."""
        self._require_setup()
        from .utils import checkpoint
        checkpoint.save(path, self)

    @classmethod
    def load(cls, path):
        from .utils import checkpoint
        return checkpoint.load(path, cls)
