"""Log-depth horizon recursions via `lax.associative_scan`.

The reference's backward/forward passes are sequential affine recurrences over
the horizon (admm.cpp:13-20, 25-35).  Both have the form

    s_{next} = M s + b

with constant M, i.e. an *affine scan* with the associative operator

    (M1, b1) o (M2, b2) = (M1 @ M2, M1 @ b2 + b1)      [suffix / backward]
    (M1, b1) o (M2, b2) = (M2 @ M1, M2 @ b1 + b2)      [prefix / forward]

This is the sequence-parallel slot of this project (SURVEY.md §5.7): O(log N)
depth instead of O(N).  HONEST STATUS (measured, docs/DESIGN.md §3): on TPU
with a saturating batch the associative scan NEVER beats the sequential scan
at any horizon tried (N=64..1024) — log depth buys nothing when the chip is
already busy, and its larger constant loses.  The productive long-horizon
path is the CHUNKED CONDENSATION below (build_chunk_maps /
forward_pass_chunked / backward_pass_chunked): condense C-stage blocks into
one reusable chunk map (the plant is time-invariant) and lax.scan over N/C
chunks — O((C(nx+nu))^2) memory, most of the full condensation's MXU win,
no O(N^2) map.  Results of all of these are numerically equal to the
sequential scans up to floating-point reassociation (not bit-identical) —
use the sequential path when golden iterate parity matters.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from ..types import Cache, Problem, State


def _affine_scan_suffix(M, b):
    """Suffix composites of the backward recurrence p_i = M p_{i+1} + b_i.

    M: (nx, nx) shared; b: (T, nx).  Returns (Ms, bs) with
    p_i = Ms[i] @ p_T + bs[i] where p_T is the terminal value.
    """
    T = b.shape[0]
    Ms = jnp.broadcast_to(M, (T,) + M.shape)

    # `lax.associative_scan(reverse=True)` flips, scans, flips back: the first
    # combine argument is the element *nearer the end* of the array, i.e. the
    # affine map applied FIRST.  combine(a, b) = "apply a, then b".
    def combine(first, second):
        M1, b1 = first
        M2, b2 = second
        return (jnp.einsum("...ij,...jk->...ik", M2, M1),
                jnp.einsum("...ij,...j->...i", M2, b1) + b2)

    return lax.associative_scan(combine, (Ms, b), reverse=True, axis=0)


def _affine_scan_prefix(M, b):
    """Prefix composites of the forward recurrence x_{i+1} = M x_i + b_i.

    Returns (Ms, bs) with x_{i+1} = Ms[i] @ x_0 + bs[i].
    """
    T = b.shape[0]
    Ms = jnp.broadcast_to(M, (T,) + M.shape)

    def combine(earlier, later):
        M1, b1 = earlier
        M2, b2 = later
        return (jnp.einsum("...ij,...jk->...ik", M2, M1),
                jnp.einsum("...ij,...j->...i", M2, b1) + b2)

    return lax.associative_scan(combine, (Ms, b), axis=0)


class ChunkMaps(NamedTuple):
    """Precomputed per-chunk condensation maps for the chunked horizon path
    (build_chunk_maps).  The plant is time-invariant, so ONE chunk map is
    reused across all N/C chunks — O((C(nx+nu))^2) memory instead of the
    full condensation's O((N(nx+nu))^2), with N/C serial steps of large
    MXU matmuls instead of N tiny dependent matvecs.

    T1c: the forward chunk map ([d_chunk; s; 1] -> [u_chunk; x_{0..C}]) —
         exactly ops/condensed._t1_numpy at horizon C+1.
    Pp:  (C nx, nx)   p_{start+j} = Am^(C-j) p_end + ...
    Pc:  (C nx, C nx) ... + sum_{k>=j} Am^(k-j) c_{start+k}.
    """
    T1c: jnp.ndarray
    Pp: jnp.ndarray
    Pc: jnp.ndarray


def chunk_size_from_maps(cmaps: ChunkMaps, nx: int, nu: int) -> int:
    """Recover the (static) chunk size from the map shapes."""
    return (cmaps.T1c.shape[-1] - nx - 1) // nu


def build_chunk_maps(problem: Problem, cache: Cache, C: int) -> ChunkMaps:
    """Host-side (float64) build of the chunk maps; cast to problem dtype.

    Requires (N - 1) % C == 0.  The reference anchor is the pair of
    recursions being condensed chunk-wise: admm.cpp:13-35."""
    import numpy as np

    from . import condensed as _cnd

    N = problem.N
    if (N - 1) % C != 0:
        raise ValueError(f"chunk size {C} must divide N-1 = {N - 1}")
    A = np.asarray(problem.A, np.float64)
    B = np.asarray(problem.B, np.float64)
    f = np.asarray(problem.f, np.float64)
    K = np.asarray(cache.Kinf, np.float64)
    Am = np.asarray(cache.AmBKt, np.float64)
    nx = A.shape[0]

    T1c = _cnd._t1_numpy(A, B, f, K, C + 1)

    powers = [np.eye(nx)]
    for _ in range(C):
        powers.append(Am @ powers[-1])
    Pp = np.concatenate([powers[C - j] for j in range(C)], axis=0)
    Pc = np.zeros((C * nx, C * nx))
    for j in range(C):
        for k in range(j, C):
            Pc[j * nx:(j + 1) * nx, k * nx:(k + 1) * nx] = powers[k - j]

    dtype = problem.A.dtype
    return ChunkMaps(T1c=jnp.asarray(T1c, dtype), Pp=jnp.asarray(Pp, dtype),
                     Pc=jnp.asarray(Pc, dtype))


def forward_pass_chunked(state: State, problem: Problem, cache: Cache,
                         cmaps: ChunkMaps) -> State:
    """Chunked forward rollout (admm.cpp:25-35 semantics): lax.scan over
    N/C chunks, each step ONE (C(nx+nu)+nx, C nu+nx+1) matmul — equal to
    the sequential pass up to float reassociation."""
    nx, nu = problem.nx, problem.nu
    C = chunk_size_from_maps(cmaps, nx, nu)
    Nc = (problem.N - 1) // C
    su_c = C * nu
    d2 = state.d.reshape(Nc, su_c)
    one = jnp.ones((1,), state.x.dtype)

    def step(s, dc):
        vec = jnp.concatenate([dc, s, one])
        out = cmaps.T1c @ vec
        u = out[:su_c].reshape(C, nu)
        x_blk = out[su_c + nx:].reshape(C, nx)  # x_{1..C} of the chunk
        return x_blk[-1], (u, x_blk)

    _, (u, x_tail) = lax.scan(step, state.x[0], d2)
    x = jnp.concatenate([state.x[0][None, :],
                         x_tail.reshape(Nc * C, nx)], axis=0)
    return state.replace(x=x, u=u.reshape(Nc * C, nu))


def backward_pass_chunked(state: State, problem: Problem, cache: Cache,
                          cmaps: ChunkMaps) -> State:
    """Chunked backward recursion (admm.cpp:13-20 semantics): reverse
    lax.scan over N/C chunks; the in-chunk p block is two matmuls, then
    d_i = Quu_inv (B^T p_{i+1} + r_i) as one batched contraction."""
    nx, nu = problem.nx, problem.nu
    C = chunk_size_from_maps(cmaps, nx, nu)
    Nc = (problem.N - 1) // C
    B = problem.B
    c = state.q[:-1] - state.r @ cache.Kinf      # q_i - Kinf^T r_i, (N-1, nx)
    c2 = c.reshape(Nc, C * nx)
    r2 = state.r.reshape(Nc, C, nu)
    p_N = state.p[-1]

    def step(p_end, inp):
        c_chunk, r_chunk = inp
        p_blk = cmaps.Pp @ p_end + cmaps.Pc @ c_chunk        # (C nx,)
        p_next = jnp.concatenate([p_blk[nx:], p_end]).reshape(C, nx)
        d = (p_next @ B + r_chunk) @ cache.Quu_inv.T
        return p_blk[:nx], (d, p_blk.reshape(C, nx))

    _, (d, p_blks) = lax.scan(step, p_N, (c2, r2), reverse=True)
    p = jnp.concatenate([p_blks.reshape(Nc * C, nx), p_N[None, :]], axis=0)
    return state.replace(d=d.reshape(Nc * C, nu), p=p)


def backward_pass_assoc(state: State, problem: Problem, cache: Cache) -> State:
    """Associative-scan form of backward_pass_grad (admm.cpp:13-20)."""
    B = problem.B
    c = state.q[:-1] - state.r @ cache.Kinf          # q_i - Kinf^T r_i, (N-1, nx)
    Ms, bs = _affine_scan_suffix(cache.AmBKt, c)
    p_head = jnp.einsum("tij,j->ti", Ms, state.p[-1]) + bs
    p = jnp.concatenate([p_head, state.p[-1][None, :]], axis=0)
    # d_i = Quu_inv (B^T p_{i+1} + r_i): now a single batched matmul.
    d = (p[1:] @ B + state.r) @ cache.Quu_inv.T
    return state.replace(d=d, p=p)


def forward_pass_assoc(state: State, problem: Problem, cache: Cache) -> State:
    """Associative-scan form of forward_pass (admm.cpp:25-35):
    x_{i+1} = (A - B Kinf) x_i + (f - B d_i),  then u_i = -Kinf x_i - d_i."""
    A, B, f = problem.A, problem.B, problem.f
    M = A - B @ cache.Kinf
    b = f - state.d @ B.T                            # (N-1, nx)
    Ms, bs = _affine_scan_prefix(M, b)
    x_tail = jnp.einsum("tij,j->ti", Ms, state.x[0]) + bs
    x = jnp.concatenate([state.x[0][None, :], x_tail], axis=0)
    u = -(x[:-1] @ cache.Kinf.T) - state.d
    return state.replace(x=x, u=u)
