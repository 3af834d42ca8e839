"""Batched solving: thousands of MPC instances as one fused XLA program.

This is the TPU build's data-parallel axis (SURVEY.md §2.6): the reference
solves one QP at a time on one core; here a leading batch axis turns every
per-stage (nx,)x(nx,nx) product into a (B, nx)x(nx, nx) MXU matmul.

Two loop strategies:

* `solve_batch` — a custom while-loop over the batched carry with explicit
  per-instance masking: converged instances freeze (bit-identical to solving
  each instance alone, reproducing the reference's early-return), and the loop
  exits when every instance converged or max_iter is hit.
* `solve_vmap`  — plain `jax.vmap` over the single-instance solve; JAX's
  while_loop batching rule applies the same per-lane masking.  Used as a
  cross-check in tests.

`problem`/`cache` may be shared (unbatched) or batched per-instance — specify
with `problem_batched`/`cache_batched`.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..types import Cache, Problem, Settings, Solution, State
from ..ops import admm


def broadcast_state(state: State, batch: int) -> State:
    """Tile a single-instance workspace to a leading batch axis."""
    return jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape), state)


def set_x0_batch(state: State, x0s) -> State:
    """Set per-instance initial states; ``x0s`` has shape (B, nx)."""
    return state.replace(x=state.x.at[:, 0, :].set(x0s))


def _tree_select(pred, on_true, on_false):
    def sel(a, b):
        p = pred.reshape(pred.shape + (1,) * (a.ndim - pred.ndim))
        return jnp.where(p, a, b)
    return jax.tree_util.tree_map(sel, on_true, on_false)


def solve_batch_impl(problem: Problem, cache: Cache, settings: Settings,
                     state: State, *, horizon_parallel: bool = False,
                     problem_batched: bool = False,
                     cache_batched: bool = False,
                     unconverged_count_fn=None, chunk_maps=None
                     ) -> Tuple[State, Cache, Solution]:
    """Batched ADMM with per-instance freezing and a whole-batch stop.

    ``unconverged_count_fn`` (optional) maps the local bool vector of
    still-running instances to a global count — the hook the sharded layer
    uses to turn the loop exit into a pod-wide convergence vote via psum
    (SURVEY.md §5.8).

    Traced under full float32 matmul precision — see admm.solve_impl."""
    with jax.default_matmul_precision("highest"):
        return _solve_batch_impl(
            problem, cache, settings, state,
            horizon_parallel=horizon_parallel,
            problem_batched=problem_batched, cache_batched=cache_batched,
            unconverged_count_fn=unconverged_count_fn,
            chunk_maps=chunk_maps)


def _solve_batch_impl(problem, cache, settings, state, *, horizon_parallel,
                      problem_batched, cache_batched, unconverged_count_fn,
                      chunk_maps=None):
    batch = state.x.shape[0]
    # Per-instance cache is required whenever adaptive-rho runs (rho diverges
    # across instances); promote a shared cache to batched in that case.
    if settings.adaptive_rho and not cache_batched:
        cache = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a, (batch,) + a.shape), cache)
        cache_batched = True

    p_ax = 0 if problem_batched else None
    c_ax = 0 if cache_batched else None

    def body_one(prob, ca, st, z_prev, v_prev, converged, i):
        carry = (st, ca, z_prev, v_prev, converged, i)
        cond_fn_l, body_fn_l = admm.make_loop_fns(
            prob, settings, horizon_parallel=horizon_parallel,
            dtype=st.x.dtype, chunk_maps=chunk_maps)
        return body_fn_l(carry)

    vbody = jax.vmap(body_one, in_axes=(p_ax, c_ax, 0, 0, 0, 0, None))

    def cond(carry):
        _, _, _, _, converged, i = carry
        running = jnp.logical_not(converged)
        if unconverged_count_fn is not None:
            count = unconverged_count_fn(running)
        else:
            count = jnp.sum(running)
        return jnp.logical_and(i < settings.max_iter, count > 0)

    def body(carry):
        st, ca, z_prev, v_prev, converged, i = carry
        new_st, new_ca, new_zp, new_vp, new_conv, _ = vbody(
            problem, ca, st, z_prev, v_prev, converged, i)
        # Freeze lanes that had already converged BEFORE this iteration
        # (reference early-return semantics, admm.cpp:181-193).
        if cache_batched:
            new_ca = _tree_select(converged, ca, new_ca)
        st = _tree_select(converged, st, new_st)
        z_prev = _tree_select(converged, z_prev, new_zp)
        v_prev = _tree_select(converged, v_prev, new_vp)
        conv = jnp.logical_or(converged, new_conv)
        return (st, new_ca if cache_batched else ca, z_prev, v_prev, conv,
                i + 1)

    state = state.replace(
        status=jnp.full((batch,), admm.TINY_UNSOLVED, jnp.int32),
        iter=jnp.zeros((batch,), jnp.int32))
    carry0 = (state, cache, state.znew, state.vnew,
              jnp.zeros((batch,), bool), jnp.zeros((), jnp.int32))
    state, cache, _, _, converged, _ = lax.while_loop(cond, body, carry0)

    solution = Solution(iter=state.iter, solved=converged.astype(jnp.int32),
                        x=state.vnew, u=state.znew)
    return state, cache, solution


@functools.partial(jax.jit, static_argnames=(
    "horizon_parallel", "problem_batched", "cache_batched"))
def solve_batch(problem: Problem, cache: Cache, settings: Settings,
                state: State, *, horizon_parallel: bool = False,
                problem_batched: bool = False, cache_batched: bool = False,
                chunk_maps=None) -> Tuple[State, Cache, Solution]:
    return solve_batch_impl(problem, cache, settings, state,
                            horizon_parallel=horizon_parallel,
                            problem_batched=problem_batched,
                            cache_batched=cache_batched,
                            chunk_maps=chunk_maps)


@functools.partial(jax.jit, static_argnames=(
    "horizon_parallel", "problem_batched", "cache_batched"))
def solve_vmap(problem: Problem, cache: Cache, settings: Settings,
               state: State, *, horizon_parallel: bool = False,
               problem_batched: bool = False, cache_batched: bool = False
               ) -> Tuple[State, Cache, Solution]:
    """vmap-of-while_loop variant (cross-check for solve_batch)."""
    p_ax = 0 if problem_batched else None
    c_ax = 0 if cache_batched else None
    fn = functools.partial(admm.solve_impl, settings=settings,
                           horizon_parallel=horizon_parallel)
    return jax.vmap(lambda p, c, s: fn(p, cache=c, state=s),
                    in_axes=(p_ax, c_ax, 0))(problem, cache, state)
