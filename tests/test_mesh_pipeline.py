"""Guard for the bench --mesh path: shard_map over the fused Pallas pipeline.

Round 3 found that `python bench.py --mesh` had never actually run: jax 0.9's
shard_map rejects pallas_call outputs under check_vma=True (pallas out_shapes
carry no vma annotation), so the whole shard_map-of-pallas construction
crashed at trace time.  This test builds the same construction as
bench.bench_cartpole's MESH branch on the 8-virtual-device CPU mesh
(interpret-mode kernel) and pins sharded == unsharded bitwise: per-tile
arithmetic is identical when the batch tile matches, so sharding only
re-chunks the grid.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from tinympc_julia_tpu import make_problem, precompute_cache
from tinympc_julia_tpu.models import cartpole
from tinympc_julia_tpu.ops.condensed import build_condensed
from tinympc_julia_tpu.ops.pallas.condensed_kernel import (
    make_condensed_fused_solver)


def test_shard_map_over_fused_pipeline_matches_local():
    dtype = jnp.float32
    N = cartpole.HORIZON
    B, B2, Bt = 64, 64, 8  # per-shard phase-2 slots = B2/8 = one tile
    p = make_problem(jnp.asarray(cartpole.A, dtype),
                     jnp.asarray(cartpole.B, dtype),
                     jnp.asarray(np.diag(cartpole.Q_DIAG), dtype),
                     jnp.asarray(np.diag(cartpole.R_DIAG), dtype),
                     cartpole.RHO, N, u_min=-5.0, u_max=5.0)
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(cartpole.RHO, dtype))
    maps = build_condensed(p, c)
    kw = dict(en_input_bound=True, en_state_bound=False,
              relaxation_alpha=1.7, check_termination=4, interpret=True)
    fn1 = make_condensed_fused_solver(4, 1, N, batch_tile=Bt, max_iter=20,
                                      carry_out=True, **kw)
    fn2 = make_condensed_fused_solver(4, 1, N, batch_tile=Bt, max_iter=40,
                                      warm_start=True, **kw)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, size=(B, 4)), dtype)
    bounds = (p.u_min, p.u_max, p.x_min, p.x_max)

    def _pipeline(x0s):
        """bench.bench_cartpole's two-phase shape: bulk, compact, continue."""
        xs1, us1, it1, ok1, carry = fn1(maps, c.rho, *bounds, x0s)
        idx = jnp.nonzero(ok1 == 0, size=B2, fill_value=0)[0]
        warm = tuple(w[:, idx] for w in carry)
        _, _, it2, ok2 = fn2(maps, c.rho, *bounds, x0s[idx], warm)
        return it1, ok1, it2, ok2

    local = jax.jit(_pipeline)

    devs = np.asarray(jax.devices())
    assert len(devs) == 8, "conftest provides 8 virtual devices"
    mesh = Mesh(devs, ("batch",))
    # per-shard straggler slots: B2s = B2 // n_dev, exactly bench's
    # mesh-mode construction (bench.py computes B2s the same way)

    def _shard_pipeline(x0s):
        xs1, us1, it1, ok1, carry = fn1(maps, c.rho, *bounds, x0s)
        idx = jnp.nonzero(ok1 == 0, size=B2 // 8, fill_value=0)[0]
        warm = tuple(w[:, idx] for w in carry)
        _, _, it2, ok2 = fn2(maps, c.rho, *bounds, x0s[idx], warm)
        return it1, ok1, it2, ok2

    sharded = jax.jit(shard_map(
        _shard_pipeline, mesh=mesh, in_specs=P("batch"),
        out_specs=(P("batch"), P("batch"), P("batch"), P("batch")),
        check_vma=False))

    it1_l, ok1_l, _, _ = (np.asarray(o) for o in local(x0s))
    it1_s, ok1_s, it2_s, ok2_s = (np.asarray(o) for o in sharded(x0s))

    # phase 1 is embarrassingly lane-parallel: bitwise identical
    np.testing.assert_array_equal(it1_l, it1_s)
    np.testing.assert_array_equal(ok1_l, ok1_s)
    # phase 2: every per-shard straggler that fit its shard's slots converged
    # or matches the local run's verdict for that lane
    unconv = (ok1_l == 0).reshape(8, -1)
    assert unconv.sum() > 0, "workload must leave phase-1 stragglers"
    for d in range(8):
        k = min(int(unconv[d].sum()), B2 // 8)
        lanes = np.nonzero(unconv[d])[0][:k] + d * (B // 8)
        seg_ok = ok2_s.reshape(8, -1)[d, :k]
        seg_it = it2_s.reshape(8, -1)[d, :k]
        assert seg_ok.shape == (k,)
        # continued lanes ran beyond phase 1
        assert np.all(seg_it[seg_ok == 1] >= 1)
        assert lanes.size == k

    # bench.straggler_mask accounting at n_dev > 1: its valid-slot mask must
    # select exactly the per-shard straggler prefixes checked above
    import importlib.util
    import pathlib
    spec = importlib.util.spec_from_file_location(
        "bench", pathlib.Path(__file__).resolve().parents[1] / "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    mask2 = bench.straggler_mask(ok1_l == 0, B2 // 8, 8)
    expect = np.zeros((8, B2 // 8), bool)
    for d in range(8):
        expect[d, :min(int(unconv[d].sum()), B2 // 8)] = True
    np.testing.assert_array_equal(mask2, expect.reshape(-1))
    # counted phase-2 converged lanes == the union over shards of the
    # prefix-slot verdicts (no fill-lane double counting)
    n2 = int(ok2_s[mask2].sum())
    n2_manual = sum(int(ok2_s.reshape(8, -1)[d, :min(int(unconv[d].sum()),
                                                     B2 // 8)].sum())
                    for d in range(8))
    assert n2 == n2_manual
