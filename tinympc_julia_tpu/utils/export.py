"""AOT export: serialize a compiled solve as a portable StableHLO artifact.

The TPU-native analog of the reference's 'standalone artifact' goal
(SURVEY.md §7 step 9): where the reference emits compilable C++ with data baked
in, this emits a `jax.export` serialized function — loadable and callable
without the framework, on any machine with jax — plus the codegen module's C++
path for non-JAX targets."""
from __future__ import annotations

import functools
import json

import jax
from jax import export as jax_export

from .. import types as T
from ..ops import admm


def _tuplify(obj):
    if isinstance(obj, list):
        return tuple(_tuplify(v) for v in obj)
    return obj


def _register_serialization():
    """Register our flax.struct pytree types with jax.export.  Auxdata is the
    tuple of static-field values (ints/bools/nested tuples) — JSON round-trips
    it, with lists restored to tuples (required for hashability)."""
    for cls in (T.ConeSet, T.Problem, T.Cache, T.Settings, T.State,
                T.Solution):
        try:
            jax_export.register_pytree_node_serialization(
                cls,
                serialized_name=f"tinympc_julia_tpu.{cls.__name__}",
                serialize_auxdata=lambda aux: json.dumps(aux).encode(),
                deserialize_auxdata=lambda blob: _tuplify(
                    json.loads(blob.decode())),
            )
        except ValueError:
            pass  # already registered


_register_serialization()


def export_solve(problem, cache, settings, state, *, horizon_parallel=False,
                 batched: bool = False):
    """Serialize the (batched) solve specialized to these shapes/settings.

    Returns bytes.  The exported callable has signature
    (problem, cache, state) -> (state, cache, solution) with the given
    settings baked in."""
    if batched:
        from ..parallel.batch import solve_batch_impl as impl
    else:
        from ..ops.admm import solve_impl as impl

    fn = functools.partial(impl, settings=settings,
                           horizon_parallel=horizon_parallel)
    jitted = jax.jit(lambda p, c, s: fn(p, cache=c, state=s))
    exported = jax_export.export(jitted)(problem, cache, state)
    return exported.serialize()


def load_solve(blob: bytes):
    """Deserialize an exported solve; returns a callable
    (problem, cache, state) -> (state, cache, solution)."""
    exported = jax_export.deserialize(blob)
    return exported.call
