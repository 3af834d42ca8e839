"""Core pytree types for the TPU-native TinyMPC framework.

Design stance (SURVEY.md §7): the solver is a pure function over pytrees, not a
stateful singleton.  Every struct below is a registered pytree (flax.struct), so
the whole solver state is `jit`/`vmap`/`shard_map`/checkpoint-compatible by
construction.

Reference data model being re-designed (not ported):
  /root/reference/src/codegen_src/tinympc/types.hpp:32-146
    TinySolution{iter,solved,x,u} / TinyCache / TinySettings / TinyWorkspace.

Layout note: the reference stores stage-major Eigen matrices (nx x N columns).
We store horizon-major arrays (N, nx) so that a batched solve (B, N, nx) turns
each per-stage operation into a (B, nx) x (nx, nx) matmul — the MXU-friendly
orientation.  The user-facing API layer (api.py) converts to/from the
reference's (nx, N) layout at the boundary.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct

Array = Any  # jax.Array at runtime; kept loose for numpy interop in the API layer


@struct.dataclass
class ConeSet:
    """A collection of second-order cone constraints on a stage vector.

    Cone k constrains the slice ``w = vec[start_k : start_k + dim_k]`` to the
    scaled SOC  ``||w[:-1]|| <= mu_k * w[-1]``  (thrust-cone semantics of the
    reference rocket example, /root/reference/examples/rocket_landing_constraints.jl:52-58
    and the binding signature /root/reference/src/bindings.cpp:453-490).

    ``starts``/``dims`` are static metadata (they determine slice shapes under
    jit); ``mus`` is traced data so cone coefficients can vary across a batch.
    """

    mus: Array  # (num_cones,) coefficients
    starts: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    dims: Tuple[int, ...] = struct.field(pytree_node=False, default=())

    @property
    def num_cones(self) -> int:
        return len(self.starts)

    @staticmethod
    def empty(dtype=jnp.float32) -> "ConeSet":
        return ConeSet(mus=jnp.zeros((0,), dtype=dtype), starts=(), dims=())


@struct.dataclass
class Problem:
    """Immutable problem data (the reference's user-supplied workspace fields).

    Mirrors TinyWorkspace's problem-data subset
    (/root/reference/src/codegen_src/tinympc/types.hpp:108-122) plus the
    submodule-only extensions exposed by the bindings: affine dynamics term
    ``f`` (/root/reference/src/bindings.cpp:21-56) and per-stage linear / SOC
    constraint data (/root/reference/src/bindings.cpp:414-490).

    ``Q``/``R`` are the rho-folded diagonal costs, exactly like
    ``work->Q = (Q + rho*I).diagonal()`` at
    /root/reference/src/codegen_src/tinympc/tiny_api.cpp:90-91.
    """

    A: Array  # (nx, nx) state transition
    B: Array  # (nx, nu) input matrix
    f: Array  # (nx,)    affine dynamics term (zeros when unused)
    Q: Array  # (nx,)    rho-folded diagonal state cost
    R: Array  # (nu,)    rho-folded diagonal input cost

    # Box bounds, horizon-major.
    x_min: Array  # (N, nx)
    x_max: Array  # (N, nx)
    u_min: Array  # (N-1, nu)
    u_max: Array  # (N-1, nu)

    # References to track.
    Xref: Array  # (N, nx)
    Uref: Array  # (N-1, nu)

    # Per-stage linear inequality constraints  Alin_x @ x <= blin_x  (every stage).
    Alin_x: Array  # (mx, nx)
    blin_x: Array  # (mx,)
    Alin_u: Array  # (mu, nu)
    blin_u: Array  # (mu,)

    # Second-order cone constraints.
    cones_x: ConeSet
    cones_u: ConeSet

    # The setup-time rho folded into Q/R (tiny_api.cpp:90-91).  Lets the
    # opt-in exact adaptive-rho rebuild (Settings.adaptive_rho_rebuild)
    # recover the user cost (Q - rho_setup) when re-running the Riccati
    # fixed point at a new rho.  Scalar; (G,) under a leading group axis.
    rho_setup: Array = 0.0

    @property
    def nx(self) -> int:
        return self.A.shape[-1]

    @property
    def nu(self) -> int:
        return self.B.shape[-1]

    @property
    def N(self) -> int:
        return self.Xref.shape[-2]


@struct.dataclass
class Settings:
    """Solver settings.

    Mirrors TinySettings (/root/reference/src/codegen_src/tinympc/types.hpp:61-74)
    plus the four submodule-only enable flags pushed by the bindings
    (/root/reference/src/bindings.cpp:354-359).

    Loop bounds and enable flags are static metadata: they select compiled
    control flow.  Tolerances and rho limits are traced data so they can be
    changed without recompilation (and vary across a batch).
    """

    abs_pri_tol: Array = 1e-3
    abs_dua_tol: Array = 1e-3
    adaptive_rho_min: Array = 1.0
    adaptive_rho_max: Array = 100.0
    # EXTENSION: trust-region half-width for the "termination" controller,
    # applied as a final clip new_rho in [rho_setup - trust, rho_setup + trust]
    # (rho_setup = the sensitivity/Taylor expansion center).  inf (default)
    # disables the clip.  Set ~2.0 on the Taylor-based condensed/fused paths,
    # where the measured validity radius of the first-order cache is |drho|~2
    # (docs/DESIGN.md §4); leave inf when paired with adaptive_rho_rebuild
    # (the exact rebuild has no expansion radius).  Traced leaf.
    adaptive_rho_taylor_trust: Array = float("inf")
    # ADMM over-relaxation factor alpha (1.0 = reference behavior; ~1.6
    # typically cuts iterations 30-50% for the same fixed point).  Applied as
    # u_hat = alpha*u + (1-alpha)*z in the slack/dual updates.
    relaxation_alpha: float = struct.field(pytree_node=False, default=1.0)

    max_iter: int = struct.field(pytree_node=False, default=1000)
    # check_termination == k: evaluate residuals every k iterations; 0 disables.
    check_termination: int = struct.field(pytree_node=False, default=1)
    en_state_bound: bool = struct.field(pytree_node=False, default=True)
    en_input_bound: bool = struct.field(pytree_node=False, default=True)
    en_state_soc: bool = struct.field(pytree_node=False, default=False)
    en_input_soc: bool = struct.field(pytree_node=False, default=False)
    en_state_linear: bool = struct.field(pytree_node=False, default=False)
    en_input_linear: bool = struct.field(pytree_node=False, default=False)
    adaptive_rho: bool = struct.field(pytree_node=False, default=False)
    adaptive_rho_enable_clipping: bool = struct.field(pytree_node=False, default=True)
    # EXTENSION (off = reference behavior): on the rho-update gate, re-run
    # the Riccati fixed point at the predicted rho (exact on-device cache
    # rebuild, the batched analog of re-calling
    # tiny_precompute_and_set_cache, tiny_api.cpp:124-190) instead of the
    # first-order Taylor extrapolation (rho_benchmark.cpp:199-212), and
    # refresh Quu_inv/AmBKt too (no dead-write quirk — the rebuilt cache is
    # self-consistent, so adaptation works far outside the Taylor radius).
    # Standard/batched paths only; the condensed/fused paths keep Taylor.
    adaptive_rho_rebuild: bool = struct.field(pytree_node=False, default=False)
    # EXTENSION ("osqp" = reference behavior): which residuals drive the rho
    # prediction.  "osqp" is the reference's stacked OSQP-form controller
    # (rho_benchmark.cpp:146-197) — measured structurally decay-biased on
    # regulation problems (its q/P terms never vanish at convergence, so
    # normalized_dual stays O(1) while normalized_pri -> 0; docs/DESIGN.md
    # §4).  "termination" predicts from the solver's own termination
    # residuals, each normalized by ITS OWN tolerance:
    # rho *= sqrt((pri/pri_tol) / (dual/dua_tol)) — it raises rho when the
    # primal check is the laggard and lowers it when the dual check is,
    # directly targeting the termination condition.  Pair with
    # adaptive_rho_rebuild: raising rho through the Taylor cache is
    # measured-fatal (DESIGN §4 point 3).
    adaptive_rho_controller: str = struct.field(pytree_node=False,
                                                default="osqp")
    # EXTENSION (0 = off = reference-exact numerics): on the fused
    # fixed-rho path, run the FIRST k iterations with one-pass bf16
    # matmuls before continuing at full precision — the in-kernel
    # precision staging measured +24% on the headline workload
    # (docs/DESIGN.md §5).  Must be a multiple of check_termination below
    # max_iter; incompatible with adaptive_rho (the rho prediction would
    # read bf16-noise residuals).  Solution QUALITY is unchanged (the
    # termination check always evaluates true residuals at tolerance);
    # the PATH to the fixed point reassociates, so this is opt-in.
    bf16_head_iters: int = struct.field(pytree_node=False, default=0)


def settings_bake_key(s: Settings) -> tuple:
    """Hashable cache key for Pallas kernel factories that BAKE a Settings
    (documented carve-out: the fused kernels take tolerances/rho-limits as
    build-time floats).  The Settings pytree itself is not a safe dict key —
    traced leaves may be jax arrays (unhashable)."""
    return (float(s.abs_pri_tol), float(s.abs_dua_tol),
            float(s.adaptive_rho_min), float(s.adaptive_rho_max),
            float(s.adaptive_rho_taylor_trust),
            float(s.relaxation_alpha), s.max_iter, s.check_termination,
            s.en_state_bound, s.en_input_bound, s.en_state_soc,
            s.en_input_soc, s.en_state_linear, s.en_input_linear,
            s.adaptive_rho, s.adaptive_rho_enable_clipping,
            s.adaptive_rho_rebuild, s.adaptive_rho_controller,
            s.bf16_head_iters)


def default_settings() -> Settings:
    """Library defaults, mirroring TINY_DEFAULT_* constants
    (/root/reference/src/codegen_src/tinympc/tiny_api_constants.hpp:5-10) and the
    adaptive-rho defaults in tiny_set_default_settings
    (/root/reference/src/codegen_src/tinympc/tiny_api.cpp:226-229)."""
    return Settings()


@struct.dataclass
class Cache:
    """Precomputed Riccati cache + rho sensitivities.

    Mirrors TinyCache (/root/reference/src/codegen_src/tinympc/types.hpp:42-56).
    Reference-parity quirk preserved deliberately: the ADMM backward pass reads
    ``Quu_inv``/``AmBKt`` (admm.cpp:17-18) while the adaptive-rho Taylor update
    writes ``Kinf``/``Pinf``/``C1``/``C2`` (rho_benchmark.cpp:204-207) — so
    ``C1``/``C2`` updates are never consumed by the hot loop.  We keep all six
    fields distinct to reproduce reference iterates exactly.
    """

    rho: Array  # scalar
    Kinf: Array  # (nu, nx)
    Pinf: Array  # (nx, nx)
    Quu_inv: Array  # (nu, nu)
    AmBKt: Array  # (nx, nx)
    C1: Array  # (nu, nu)  == Quu_inv at setup
    C2: Array  # (nx, nx)  == AmBKt at setup

    # Sensitivities d{.}/d rho for first-order Taylor cache updates.
    dKinf_drho: Array  # (nu, nx)
    dPinf_drho: Array  # (nx, nx)
    dC1_drho: Array  # (nu, nu)
    dC2_drho: Array  # (nx, nx)


@struct.dataclass
class State:
    """The mutable solver workspace, as a value.

    Mirrors the iterate subset of TinyWorkspace
    (/root/reference/src/codegen_src/tinympc/types.hpp:84-135).  Persisting this
    struct across `solve` calls gives the reference's implicit warm-starting
    (SURVEY.md §5.4).
    """

    x: Array  # (N, nx)   state trajectory
    u: Array  # (N-1, nu) input trajectory
    q: Array  # (N, nx)   linear state cost
    r: Array  # (N-1, nu) linear input cost
    p: Array  # (N, nx)   Riccati linear terms
    d: Array  # (N-1, nu) feedforward terms
    v: Array  # (N, nx)   previous state slack
    vnew: Array  # (N, nx)
    z: Array  # (N-1, nu) previous input slack
    znew: Array  # (N-1, nu)
    g: Array  # (N, nx)   state dual
    y: Array  # (N-1, nu) input dual

    primal_residual_state: Array  # scalar
    primal_residual_input: Array
    dual_residual_state: Array
    dual_residual_input: Array
    status: Array  # int32 scalar; 11 = TINY_UNSOLVED, 1 = TINY_SOLVED
    iter: Array  # int32 scalar


@struct.dataclass
class Solution:
    """Mirrors TinySolution (/root/reference/src/codegen_src/tinympc/types.hpp:32-37).
    ``x``/``u`` are the *slack* iterates vnew/znew — the feasible copies — exactly
    as the reference returns (admm.cpp:187-188)."""

    iter: Array  # int32
    solved: Array  # int32
    x: Array  # (N, nx)
    u: Array  # (N-1, nu)


def init_state(nx: int, nu: int, N: int, dtype=jnp.float32) -> State:
    """Zero workspace, mirroring tiny_setup's zero-init
    (/root/reference/src/codegen_src/tinympc/tiny_api.cpp:73-110)."""
    fN = lambda: jnp.zeros((N, nx), dtype)
    fNm1 = lambda: jnp.zeros((N - 1, nu), dtype)
    s = lambda: jnp.zeros((), dtype)
    return State(
        x=fN(), u=fNm1(), q=fN(), r=fNm1(), p=fN(), d=fNm1(),
        v=fN(), vnew=fN(), z=fNm1(), znew=fNm1(), g=fN(), y=fNm1(),
        primal_residual_state=s(), primal_residual_input=s(),
        dual_residual_state=s(), dual_residual_input=s(),
        status=jnp.zeros((), jnp.int32), iter=jnp.zeros((), jnp.int32),
    )


def make_problem(A, B, Q, R, rho, N, *, f=None, x_min=None, x_max=None,
                 u_min=None, u_max=None, Xref=None, Uref=None,
                 Alin_x=None, blin_x=None, Alin_u=None, blin_u=None,
                 cones_x=None, cones_u=None, dtype=None) -> Problem:
    """Build a Problem with rho-folded diagonal costs.

    ``Q``/``R`` may be full matrices (diagonals are taken, mirroring
    /root/reference/src/codegen_src/tinympc/tiny_api.cpp:90-91) or 1-D
    diagonal vectors.
    """
    A = jnp.asarray(A, dtype)
    dtype = A.dtype
    B = jnp.asarray(B, dtype)
    nx, nu = A.shape[0], B.shape[1]
    Q = jnp.asarray(Q, dtype)
    R = jnp.asarray(R, dtype)
    if Q.ndim == 2:
        Q = jnp.diagonal(Q)
    if R.ndim == 2:
        R = jnp.diagonal(R)
    rho = jnp.asarray(rho, dtype)
    Q = Q + rho
    R = R + rho

    big = jnp.asarray(jnp.inf, dtype)
    fill = lambda val, shape: jnp.full(shape, val, dtype)
    as_or = lambda v, shape, default: (fill(default, shape) if v is None
                                       else jnp.broadcast_to(jnp.asarray(v, dtype), shape))
    return Problem(
        A=A, B=B,
        f=as_or(f, (nx,), 0.0),
        Q=Q, R=R,
        x_min=as_or(x_min, (N, nx), -big), x_max=as_or(x_max, (N, nx), big),
        u_min=as_or(u_min, (N - 1, nu), -big), u_max=as_or(u_max, (N - 1, nu), big),
        Xref=as_or(Xref, (N, nx), 0.0), Uref=as_or(Uref, (N - 1, nu), 0.0),
        Alin_x=jnp.zeros((0, nx), dtype) if Alin_x is None else jnp.asarray(Alin_x, dtype),
        blin_x=jnp.zeros((0,), dtype) if blin_x is None else jnp.asarray(blin_x, dtype),
        Alin_u=jnp.zeros((0, nu), dtype) if Alin_u is None else jnp.asarray(Alin_u, dtype),
        blin_u=jnp.zeros((0,), dtype) if blin_u is None else jnp.asarray(blin_u, dtype),
        cones_x=cones_x if cones_x is not None else ConeSet.empty(dtype),
        cones_u=cones_u if cones_u is not None else ConeSet.empty(dtype),
        rho_setup=rho,
    )
