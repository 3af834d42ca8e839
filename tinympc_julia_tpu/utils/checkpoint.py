"""Solver checkpoint/resume.

The reference's closest analog is codegen's baked-state serialization
(SURVEY.md §5.4): the entire solver — cache, settings, workspace including
live iterates — becomes data.  Here the solver IS a pytree, so a checkpoint is
a flat .npz of leaves plus a small JSON of static metadata; reload restores an
identical solver (warm starts and all)."""
from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from .. import types as T


def _flatten(prefix, tree, out):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    for i, leaf in enumerate(leaves):
        out[f"{prefix}{i}"] = np.asarray(leaf)
    return treedef


def save(path, solver) -> None:
    if not solver.is_setup:
        raise RuntimeError("Solver not setup")
    arrays = {}
    _flatten("problem_", solver.problem, arrays)
    _flatten("cache_", solver.cache, arrays)
    _flatten("state_", solver.state, arrays)
    s = solver.settings
    meta = dict(
        version=1,
        dtype=str(np.dtype(solver.dtype)),
        cones_x=dict(starts=list(solver.problem.cones_x.starts),
                     dims=list(solver.problem.cones_x.dims)),
        cones_u=dict(starts=list(solver.problem.cones_u.starts),
                     dims=list(solver.problem.cones_u.dims)),
        settings=dict(
            abs_pri_tol=float(s.abs_pri_tol), abs_dua_tol=float(s.abs_dua_tol),
            adaptive_rho_min=float(s.adaptive_rho_min),
            adaptive_rho_max=float(s.adaptive_rho_max),
            max_iter=int(s.max_iter), check_termination=int(s.check_termination),
            en_state_bound=bool(s.en_state_bound),
            en_input_bound=bool(s.en_input_bound),
            en_state_soc=bool(s.en_state_soc),
            en_input_soc=bool(s.en_input_soc),
            en_state_linear=bool(s.en_state_linear),
            en_input_linear=bool(s.en_input_linear),
            adaptive_rho=bool(s.adaptive_rho),
            adaptive_rho_enable_clipping=bool(s.adaptive_rho_enable_clipping),
        ),
        user={k: (np.asarray(v).tolist() if isinstance(v, np.ndarray) else v)
              for k, v in solver._user.items()},
    )
    np.savez(path, __meta__=json.dumps(meta), **arrays)


def _unflatten(prefix, example_tree, data, dtype):
    leaves, treedef = jax.tree_util.tree_flatten(example_tree)
    new_leaves = []
    for i, leaf in enumerate(leaves):
        arr = data[f"{prefix}{i}"]
        new_leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def load(path, solver_cls):
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    dtype = jnp.dtype(meta["dtype"])
    user = meta["user"]
    nx, nu, N = user["nx"], user["nu"], user["N"]

    solver = solver_cls(dtype=dtype)
    # Build example trees with the right structure (cone statics come from
    # metadata), then fill leaves from the checkpoint.
    cx = meta["cones_x"]
    cu = meta["cones_u"]
    cones_x = T.ConeSet(mus=jnp.zeros((len(cx["starts"]),), dtype),
                        starts=tuple(cx["starts"]), dims=tuple(cx["dims"]))
    cones_u = T.ConeSet(mus=jnp.zeros((len(cu["starts"]),), dtype),
                        starts=tuple(cu["starts"]), dims=tuple(cu["dims"]))
    example_problem = T.make_problem(
        jnp.zeros((nx, nx), dtype), jnp.zeros((nx, nu), dtype),
        jnp.zeros((nx,), dtype), jnp.zeros((nu,), dtype), 0.0, N,
        Alin_x=np.zeros((0, nx)), blin_x=np.zeros(0),
        Alin_u=np.zeros((0, nu)), blin_u=np.zeros(0),
        cones_x=cones_x, cones_u=cones_u, dtype=dtype)
    # Linear-constraint leaf shapes must match the saved ones; rebuild with
    # the shapes found in the checkpoint by probing the flattened leaves.
    flat_p, treedef_p = jax.tree_util.tree_flatten(example_problem)
    new_leaves = [jnp.asarray(data[f"problem_{i}"])
                  for i in range(len(flat_p))]
    solver.problem = jax.tree_util.tree_unflatten(treedef_p, new_leaves)

    example_cache = T.Cache(
        rho=jnp.zeros((), dtype),
        Kinf=jnp.zeros((nu, nx), dtype), Pinf=jnp.zeros((nx, nx), dtype),
        Quu_inv=jnp.zeros((nu, nu), dtype), AmBKt=jnp.zeros((nx, nx), dtype),
        C1=jnp.zeros((nu, nu), dtype), C2=jnp.zeros((nx, nx), dtype),
        dKinf_drho=jnp.zeros((nu, nx), dtype),
        dPinf_drho=jnp.zeros((nx, nx), dtype),
        dC1_drho=jnp.zeros((nu, nu), dtype),
        dC2_drho=jnp.zeros((nx, nx), dtype))
    solver.cache = _unflatten("cache_", example_cache, data, dtype)
    solver.state = _unflatten("state_", T.init_state(nx, nu, N, dtype), data,
                              dtype)
    solver.settings = T.Settings(**meta["settings"])
    solver._user = {k: (np.asarray(v) if isinstance(v, list) else v)
                    for k, v in user.items()}
    solver.is_setup = True
    return solver
