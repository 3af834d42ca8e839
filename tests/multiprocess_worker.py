"""Worker process for the multi-process (DCN-analog) sharding test.

Launched by tests/test_multiprocess.py: N processes x 4 virtual CPU devices
each, connected through jax.distributed + gloo CPU collectives.  Runs the
sharded solve (psum convergence vote crosses the process boundary — the
DCN-analog path) and asserts parity of this process's shard against a local
unsharded solve of the same lanes.

Usage: python multiprocess_worker.py <process_id> <num_processes> <port>
"""
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tinympc_julia_tpu import (Settings, init_state, make_problem,  # noqa: E402
                               precompute_cache)
from tinympc_julia_tpu.models import cartpole  # noqa: E402
from tinympc_julia_tpu.parallel import broadcast_state, set_x0_batch  # noqa: E402
from tinympc_julia_tpu.parallel.batch import solve_batch  # noqa: E402
from tinympc_julia_tpu.parallel.sharded import solve_sharded  # noqa: E402


def main():
    n_local = jax.local_device_count()
    n_global = jax.device_count()
    assert n_global == nproc * n_local, (n_global, nproc, n_local)
    mesh = Mesh(np.array(jax.devices()), ("batch",))

    dtype = jnp.float64
    N, B = 10, 4 * n_global  # 4 lanes per device
    p = make_problem(jnp.asarray(cartpole.A, dtype),
                     jnp.asarray(cartpole.B, dtype),
                     jnp.asarray(np.diag(cartpole.Q_DIAG), dtype),
                     jnp.asarray(np.diag(cartpole.R_DIAG), dtype),
                     cartpole.RHO, N, u_min=-5.0, u_max=5.0)
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(cartpole.RHO, dtype))
    s = Settings(max_iter=60, en_state_bound=False, en_input_bound=True)

    rng = np.random.default_rng(0)  # same seed everywhere: global x0 view
    x0s_global = rng.uniform(-0.5, 0.5, size=(B, 4))
    st_global = set_x0_batch(
        broadcast_state(init_state(4, 1, N, dtype), B),
        jnp.asarray(x0s_global, dtype))

    # Build the globally-sharded state from this process's local rows.
    rows = B // nproc
    lo = pid * rows

    def to_global(a):
        sh = NamedSharding(mesh, P("batch", *([None] * (a.ndim - 1))))
        local = np.asarray(a)[lo:lo + rows]
        return jax.make_array_from_process_local_data(sh, local)

    st = jax.tree_util.tree_map(to_global, st_global)

    _, _, sol = solve_sharded(p, c, s, st, mesh, vote=True)
    jax.block_until_ready(sol.u)

    # Local reference: unsharded masked batched solve of THIS process's lanes.
    st_local = jax.tree_util.tree_map(lambda a: np.asarray(a)[lo:lo + rows],
                                      st_global)
    st_local = jax.tree_util.tree_map(jnp.asarray, st_local)
    _, _, ref = solve_batch(p, c, s, st_local)

    # Addressable shards of the global solution == this process's lanes.
    def local_view(a):
        shards = sorted(a.addressable_shards, key=lambda sh: sh.index[0].start)
        return np.concatenate([np.asarray(sh.data) for sh in shards], axis=0)

    np.testing.assert_array_equal(local_view(sol.iter), np.asarray(ref.iter))
    np.testing.assert_array_equal(local_view(sol.solved),
                                  np.asarray(ref.solved))
    np.testing.assert_allclose(local_view(sol.u), np.asarray(ref.u),
                               atol=1e-12)
    n_solved = int(np.asarray(jax.device_get(
        jax.jit(lambda x: jnp.sum(x))(sol.solved))))
    print(f"worker {pid}/{nproc}: OK local_devices={n_local} "
          f"global_devices={n_global} solved={n_solved}/{B}", flush=True)

    pipeline_leg(mesh)
    print(f"worker {pid}/{nproc}: pipeline OK", flush=True)


def pipeline_leg(mesh):
    """Second leg (VERDICT r4 item 6): the shard_map-over-Pallas two-phase
    straggler pipeline (what `bench.py --mesh` runs) across a REAL process
    boundary — each shard compacts its own stragglers; outputs are pinned
    BITWISE against an unsharded local run of the identical pipeline on
    this process's lanes (per-shard compute is process-local by
    construction; this exercises the multi-host lowering the
    single-process dryrun cannot)."""
    from jax import shard_map
    from tinympc_julia_tpu.ops.condensed import build_condensed
    from tinympc_julia_tpu.ops.pallas.condensed_kernel import (
        make_condensed_fused_solver)

    f32 = jnp.float32
    N = 10
    n_global = jax.device_count()
    n_local = jax.local_device_count()
    Bt = 8  # interpret-mode tile
    B = Bt * n_global      # one tile per device
    B2s = Bt               # per-shard phase-2 slots
    p = make_problem(jnp.asarray(cartpole.A, f32),
                     jnp.asarray(cartpole.B, f32),
                     jnp.asarray(np.diag(cartpole.Q_DIAG), f32),
                     jnp.asarray(np.diag(cartpole.R_DIAG), f32),
                     cartpole.RHO, N, u_min=-5.0, u_max=5.0)
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(cartpole.RHO, f32))
    maps = build_condensed(p, c)
    bounds = (p.u_min, p.u_max, p.x_min, p.x_max)
    kw = dict(en_input_bound=True, en_state_bound=False,
              check_termination=4, interpret=True)
    fn1 = make_condensed_fused_solver(4, 1, N, batch_tile=Bt, max_iter=8,
                                      carry_out=True, **kw)
    fn2 = make_condensed_fused_solver(4, 1, N, batch_tile=Bt, max_iter=40,
                                      warm_start=True, **kw)

    def _pipeline(x0s):
        _, _, it1, ok1, carry = fn1(maps, c.rho, *bounds, x0s)
        unconv = ok1 == 0
        idx = jnp.nonzero(unconv, size=B2s, fill_value=0)[0]
        warm = tuple(w[:, idx] for w in carry)
        _, _, it2, ok2 = fn2(maps, c.rho, *bounds, x0s[idx], warm)
        return it1, ok1, idx, it2, ok2, unconv

    pipe = jax.jit(shard_map(
        _pipeline, mesh=mesh, in_specs=P("batch"),
        out_specs=tuple([P("batch")] * 6), check_vma=False))

    rng = np.random.default_rng(7)  # same seed everywhere: global view
    x0s_global = rng.uniform(-0.5, 0.5, size=(B, 4)).astype(np.float32)
    rows = B // nproc
    lo = pid * rows
    sh = NamedSharding(mesh, P("batch"))
    x0s = jax.make_array_from_process_local_data(
        sh, x0s_global[lo:lo + rows])
    out = pipe(x0s)
    jax.block_until_ready(out)

    def local_view(a):
        shards = sorted(a.addressable_shards,
                        key=lambda s: s.index[0].start)
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)

    # local reference: the identical pipeline, unsharded, one shard at a
    # time (per-device shards of Bt lanes, B2s slots each)
    for d in range(n_local):
        shard_lo = lo + d * Bt
        ref = _pipeline(jnp.asarray(x0s_global[shard_lo:shard_lo + Bt]))
        for k, name in enumerate(("it1", "ok1", "idx", "it2", "ok2",
                                  "unconv")):
            got = local_view(out[k])[d * Bt:(d + 1) * Bt]
            np.testing.assert_array_equal(
                got, np.asarray(ref[k]),
                err_msg=f"{name} shard {pid}.{d}")
    # the leg must exercise real phase-2 work on this process's shards
    # (phase-1 budget 8 is deliberately too small to converge everything)
    assert local_view(out[5]).sum() > 0


if __name__ == "__main__":
    main()
