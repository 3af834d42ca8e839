"""Log-depth horizon recursions via `lax.associative_scan`.

The reference's backward/forward passes are sequential affine recurrences over
the horizon (admm.cpp:13-20, 25-35).  Both have the form

    s_{next} = M s + b

with constant M, i.e. an *affine scan* with the associative operator

    (M1, b1) o (M2, b2) = (M1 @ M2, M1 @ b2 + b1)      [suffix / backward]
    (M1, b1) o (M2, b2) = (M2 @ M1, M2 @ b1 + b2)      [prefix / forward]

This is the sequence-parallel slot of this project (SURVEY.md §5.7): O(log N)
depth instead of O(N), shardable over chips for long horizons.  Results are
numerically equal to the sequential scans up to floating-point reassociation
(not bit-identical) — use the sequential path when golden iterate parity
matters, this path when N is large.
"""
from __future__ import annotations

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
