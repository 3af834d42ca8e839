"""Slack-variable projection library: box, halfspace, second-order cone.

The ADMM slack update projects (u + y, x + g) onto the feasible set
(update_slack, /root/reference/src/codegen_src/tinympc/admm.cpp:43-59; the
vendored snapshot implements only box, with the pluggable-projection TODO at
admm.cpp:40-41 — linear and SOC projections are submodule-only features whose
contract is fixed by the binding signatures, /root/reference/src/bindings.cpp:414-490,
and the rocket example, /root/reference/examples/rocket_landing_constraints.jl:52-68).

Everything here is branch-free (where-select) so it vmaps over batches and
compiles to pure VPU code on TPU.

Projection composition order when several families are enabled:
box -> linear halfspaces -> SOC.  (The vendored reference defines no ordering
for the extended families; this order is this framework's documented contract.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..types import ConeSet


def project_box(w, w_min, w_max):
    """min(w_max, max(w_min, w)) — admm.cpp:51,57."""
    return jnp.minimum(w_max, jnp.maximum(w_min, w))


def project_halfspaces(w, Alin, blin):
    """Sequentially (cyclically) project a stage vector onto each halfspace
    a_j . w <= b_j:  w <- w - max(a.w - b, 0) * a / ||a||^2.

    ``w`` has shape (..., n); Alin (m, n); blin (m,).  Rows are applied in
    order, each seeing the previous row's result — the classic cyclic
    projection used for per-stage linear inequality constraints.
    """
    if Alin.shape[0] == 0:
        return w

    inv_sq_norms = 1.0 / jnp.maximum(
        jnp.sum(Alin * Alin, axis=-1), jnp.asarray(1e-30, w.dtype))

    def row_step(w_cur, inp):
        a, b, inv_sq = inp
        viol = jnp.maximum(jnp.tensordot(w_cur, a, axes=([-1], [0])) - b, 0.0)
        w_next = w_cur - viol[..., None] * (a * inv_sq)
        return w_next, None

    w_out, _ = lax.scan(row_step, w, (Alin, blin, inv_sq_norms))
    return w_out


def _project_soc_scaled(seg, mu):
    """Projection used by TinyMPC for the scaled cone ||w[:-1]|| <= mu * w[-1].

    With u0 = mu * w[-1] and a = ||w[:-1]||:
      a <= -u0      -> origin           (below the cone)
      a <=  u0      -> unchanged        (inside)
      otherwise     -> ((a + u0)/(2a)) * [w[:-1]; a / mu]
    This is the exact Euclidean projection of the *scaled* vector (it matches
    the standard SOC projection when mu == 1), and reproduces the thrust-cone
    behavior of the rocket example (||u[0:2]|| <= 0.25 * u[2]).
    """
    v = seg[..., :-1]
    s = seg[..., -1]
    u0 = s * mu
    a = jnp.sqrt(jnp.sum(v * v, axis=-1))
    safe_a = jnp.maximum(a, jnp.asarray(1e-30, seg.dtype))
    factor = (a + u0) / (2.0 * safe_a)
    proj_v = factor[..., None] * v
    proj_s = factor * (a / mu)
    proj = jnp.concatenate([proj_v, proj_s[..., None]], axis=-1)

    below = (a <= -u0)[..., None]
    inside = (a <= u0)[..., None]
    return jnp.where(below, jnp.zeros_like(seg), jnp.where(inside, seg, proj))


def project_soc_exact(seg, mu):
    """Exact Euclidean projection onto {(v, s): ||v|| <= mu * s} (optional,
    not the reference behavior — provided for users who want the true metric
    projection):  s* = (mu ||v|| + s)/(mu^2 + 1),  v* = mu s* v/||v||."""
    v = seg[..., :-1]
    s = seg[..., -1]
    a = jnp.sqrt(jnp.sum(v * v, axis=-1))
    safe_a = jnp.maximum(a, jnp.asarray(1e-30, seg.dtype))
    coef = (mu * a + s) / (mu * mu + 1.0)
    proj_v = (coef * mu / safe_a)[..., None] * v
    proj = jnp.concatenate([proj_v, coef[..., None]], axis=-1)
    below = (mu * a <= -s)[..., None]
    inside = (a <= mu * s)[..., None]
    return jnp.where(below, jnp.zeros_like(seg), jnp.where(inside, seg, proj))


def project_cones(w, cones: ConeSet, *, exact: bool = False):
    """Apply every cone of ``cones`` to the trailing axis of ``w`` (shape
    (..., n)).  Cone extents are static so each slice compiles to a fixed-shape
    VPU segment op."""
    if cones.num_cones == 0:
        return w
    proj_fn = project_soc_exact if exact else _project_soc_scaled
    for k, (start, dim) in enumerate(zip(cones.starts, cones.dims)):
        seg = lax.slice_in_dim(w, start, start + dim, axis=-1)
        seg = proj_fn(seg, cones.mus[k])
        w = lax.dynamic_update_slice_in_dim(w, seg, start, axis=-1)
    return w
