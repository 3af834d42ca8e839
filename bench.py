#!/usr/bin/env python3
"""Benchmark: the four BASELINE.md example configs + the domain-randomized
grouped sweep, on one chip.

North star (BASELINE.json): >= 1e5 converged cartpole MPC solves/sec on a
v5e-16 slice == 6250 solves/sec/chip.  vs_baseline measures the headline
cartpole number against that per-chip share (the reference itself publishes
no numbers, BASELINE.md).

Prints ONE JSON line to stdout: the headline metric plus an "extra" dict
carrying the other configs (quadrotor adaptive-rho, rocket SOC, fused
closed-loop MPC steps/s, randomized-quadrotor grouped sweep).  Diagnostics
go to stderr.

  --mesh    run the headline config under shard_map over all available
            devices (per-chip scaling / psum-vote overhead probe; with one
            chip this is a 1-device mesh).
  --quick   smaller batches/reps (development smoke run).
"""
import json
import sys
import time

import numpy as np

PER_CHIP_TARGET = 1e5 / 16  # north-star v5e-16 share
QUICK = "--quick" in sys.argv
MESH = "--mesh" in sys.argv


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _median_time(run, reps, sync=None):
    """Median wall-clock of ``run()``.

    Through the axon remote tunnel, ``jax.block_until_ready`` can return
    before execution finishes while the device queue is shallow (measured:
    a 42 ms program "completed" in 0.5 ms for the first few calls), so each
    rep ends with a REAL host materialization of a small output
    (``sync(out)``), and short-running configs amortize the ~35 ms tunnel
    round trip over several back-to-back calls."""
    if sync is None:
        sync = lambda out: out  # noqa: E731

    def timed(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = run()
        np.asarray(sync(out))
        return (time.perf_counter() - t0) / n

    t1 = timed(1)
    inner = max(1, min(16, int(round(0.4 / max(t1, 1e-3)))))
    return float(np.median([timed(inner) for _ in range(reps)]))


def _device_loop_time(fn, x0s, extract, reps, target_s=0.5):
    """Per-call time of ``fn(x0s)`` measured as k back-to-back solves INSIDE
    one jitted lax.fori_loop — a single dispatch, immune to the tunnel's
    per-dispatch latency (measured 10-25 ms, and episodically the client
    stops pipelining so EVERY eager call pays it; amortization across
    eager calls is then worthless).  ``extract(out) -> f32 scalar`` keeps
    each iteration live; a data-dependent (never-taken) rescale of x0s
    serializes iterations so XLA cannot collapse the loop."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def make_loop(k):
        @jax.jit
        def loop(x0s):
            def body(i, acc):
                scale = jnp.where(acc < jnp.float32(-1.0), jnp.float32(2.0),
                                  jnp.float32(1.0))
                return acc + extract(fn(x0s * scale))
            return lax.fori_loop(0, k, body, jnp.float32(0.0))
        return loop

    probe = make_loop(2)
    np.asarray(probe(x0s))  # compile probe + drain
    t0 = time.perf_counter()
    np.asarray(probe(x0s))
    t2 = time.perf_counter() - t0
    k = max(4, min(64, int(round(target_s / max(t2 / 2, 1e-3)))))
    loop = make_loop(k)
    np.asarray(loop(x0s))  # compile + drain
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(loop(x0s))
        ts.append((time.perf_counter() - t0) / k)
    return float(np.median(ts))


def straggler_mask(unconv, slots_per_shard, n_dev):
    """Valid-slot mask over the flattened phase-2 outputs.

    Each shard compacts its own stragglers into its ``slots_per_shard``
    phase-2 slots (jnp.nonzero packs real indices first, fill_value=0 pads);
    slots beyond a shard's straggler count re-solve lane 0 and must not be
    counted.  ``unconv`` is the flat (B,) phase-1 unconverged mask laid out
    shard-major.  Unit-tested on the virtual mesh in
    tests/test_mesh_pipeline.py."""
    unconv = np.asarray(unconv)
    per_shard = unconv.reshape(n_dev, -1).sum(axis=1)
    mask = np.zeros((n_dev, slots_per_shard), bool)
    for d, k in enumerate(per_shard):
        mask[d, :min(int(k), slots_per_shard)] = True
    return mask.reshape(-1)


def bench_cartpole(reps):
    """Headline: fresh cartpole solves, three-phase precision-staged
    straggler pipeline in one dispatch (BASELINE.md config 1/2 plant;
    examples/cartpole_example_one_solve.jl:11-23).

    Phase 0 runs in one-pass bf16 matmuls (Precision.DEFAULT) with a
    single end check: bf16 noise stalls ADMM at ~1e-2, but driving
    iterates into that ball costs 1/6th the MXU passes of HIGHEST — then
    phase 1 polishes warm at HIGHEST and phase 2 continues compacted
    stragglers.  Measured +24% over the all-HIGHEST two-phase r4 config
    at equal 100% convergence (tools/ab_precision.py sweeps;
    docs/DESIGN.md §5)."""
    import jax
    import jax.numpy as jnp
    from tinympc_julia_tpu import make_problem, precompute_cache
    from tinympc_julia_tpu.models import cartpole
    from tinympc_julia_tpu.ops.condensed import build_condensed
    from tinympc_julia_tpu.ops.pallas.condensed_kernel import (
        make_condensed_fused_solver)

    dtype = jnp.float32
    N = cartpole.HORIZON
    B = 8192 if QUICK else 65536
    B2 = 2048 if QUICK else 8192
    ALPHA = 1.7

    p = make_problem(jnp.asarray(cartpole.A, dtype),
                     jnp.asarray(cartpole.B, dtype),
                     jnp.asarray(np.diag(cartpole.Q_DIAG), dtype),
                     jnp.asarray(np.diag(cartpole.R_DIAG), dtype),
                     cartpole.RHO, N, u_min=-5.0, u_max=5.0)
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(cartpole.RHO, dtype))
    maps = build_condensed(p, c)

    n_dev = len(jax.devices()) if MESH else 1
    assert B % n_dev == 0 and B2 % n_dev == 0
    B2s = B2 // n_dev  # per-shard phase-2 straggler slots (total stays B2)

    kw = dict(en_input_bound=True, en_state_bound=False,
              relaxation_alpha=ALPHA, check_termination=4)
    # budgets 56bf16(single end-check) + 36H + 324H: measured-best at 100%
    # convergence (tools/ab_precision.py r5 sweeps; docs/DESIGN.md §5).
    # The bf16 phase is VPU-issue bound (its MXU pass is 6x cheaper), so
    # skipping the residual/latch block until the phase end (ct=56) buys
    # another ~4%; lanes that converge mid-phase latch at the end check.
    fn0 = make_condensed_fused_solver(4, 1, N, batch_tile=2048, max_iter=56,
                                      carry_out=True,
                                      precision=jax.lax.Precision.DEFAULT,
                                      **dict(kw, check_termination=56))
    fn1 = make_condensed_fused_solver(4, 1, N, batch_tile=2048, max_iter=36,
                                      warm_start=True, carry_out=True, **kw)
    # straggler continuation gets its own 96-iteration bf16 head
    # (in-kernel): measured +4% (docs/DESIGN.md §5)
    fn2 = make_condensed_fused_solver(4, 1, N, batch_tile=min(1024, B2s),
                                      max_iter=324, warm_start=True,
                                      bf16_head_iters=96, **kw)

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, size=(B, 4)), dtype)
    bounds = (p.u_min, p.u_max, p.x_min, p.x_max)

    def _pipeline(x0s):
        """Three-phase fused solve as ONE dispatch: bf16 bulk pass, warm
        HIGHEST polish, then compact the stragglers and CONTINUE them warm
        from their carry (exact continuation — no re-solving).  Under
        shard_map each shard compacts its own stragglers into B2s slots."""
        _, _, it0, ok0, carry0 = fn0(maps, c.rho, *bounds, x0s)
        _, _, it1, ok1p, carry = fn1(maps, c.rho, *bounds, x0s, carry0)
        ok1 = jnp.maximum(ok0, ok1p)
        unconv = ok1 == 0
        idx = jnp.nonzero(unconv, size=B2s, fill_value=0)[0]
        warm = tuple(w[:, idx] for w in carry)
        _, _, it2, ok2 = fn2(maps, c.rho, *bounds, x0s[idx], warm)
        return it1, ok1, idx, it2, ok2, unconv

    if MESH:
        from jax.sharding import Mesh, PartitionSpec as P
        from jax import shard_map
        devs = np.asarray(jax.devices())
        mesh = Mesh(devs, ("batch",))
        # check_vma=False: pallas_call out_shapes carry no vma annotation
        pipeline = jax.jit(shard_map(
            _pipeline, mesh=mesh, in_specs=P("batch"),
            out_specs=(P("batch"), P("batch"), P("batch"), P("batch"),
                       P("batch"), P("batch")), check_vma=False))
        log(f"cartpole: --mesh over {n_dev} device(s); per-device shard "
            f"{B // n_dev}, {B2s} phase-2 slots/shard")
    else:
        pipeline = jax.jit(_pipeline)

    it1, ok1, idx, it2, ok2, unconv = pipeline(x0s)
    n1 = int(np.sum(np.asarray(ok1)))
    n_straggler = int(np.sum(np.asarray(unconv)))
    mask2 = straggler_mask(unconv, B2s, n_dev)
    n2 = int(np.sum(np.asarray(ok2)[mask2]))
    n_conv = n1 + n2
    # phase-0 runs its full bf16 budget on every lane (counted as work)
    total_iters = float(56 * B + np.sum(np.asarray(it1))
                        + np.sum(np.asarray(it2)[mask2]))
    t = _device_loop_time(
        pipeline, x0s,
        lambda o: (jnp.sum(o[1]) + jnp.sum(o[4])).astype(jnp.float32), reps)
    log(f"cartpole: {n_conv}/{B} converged ({100.0 * n_conv / B:.2f}%), "
        f"median {t * 1e3:.2f} ms -> {n_conv / t:.0f} solves/s, "
        f"{total_iters / t:.3e} ADMM iters/s")
    return dict(solves_per_sec=round(n_conv / t, 1),
                iters_per_sec=round(total_iters / t, 1),
                convergence=round(n_conv / B, 4), batch=B, devices=n_dev)


def bench_quadrotor_adaptive(reps):
    """Quadrotor hover with per-lane adaptive rho (BASELINE config 3;
    /root/reference/examples/quadrotor_hover_codegen.jl:19-58), two-phase
    straggler pipeline in one dispatch.

    Controller: the in-kernel TERMINATION controller, floored at rho0
    (adaptive_rho_min = 5.0) with the Taylor trust clip (rho0 + 2).
    Measured r5 interleaved A/B (docs/DESIGN.md §4): the floor keeps the
    hard tail out of the decay-into-Taylor-plateau failure (the r3
    finding that sank every decay-capable config), while the RAISE
    headroom within the trust region lets lanes bump rho to 7 — +20% over
    the r4 osqp-clipped config at 100% convergence.

    Phase 2 REQUANTIZES: by the straggler continuation each lane's rho
    has settled, so the carried per-lane rho is snapped onto exact bucket
    caches (parallel/rebuild.rebuild_bucket_caches — no Taylor error) and
    the stragglers continue on the FIXED grouped kernel (one matmul per
    iteration instead of the adaptive kernel's three) with a bf16 head —
    measured +21% more at 100% (224k vs 185k; docs/DESIGN.md §4).  The
    big-adaptation wins are the mis-set-rho0 bucketed-rebuild rows
    (misset_rho_adaptive / misset_rho_quadrotor)."""
    import jax
    import jax.numpy as jnp
    from tinympc_julia_tpu import make_problem, precompute_cache
    from tinympc_julia_tpu.models import quadrotor
    from tinympc_julia_tpu.ops.condensed import (build_condensed,
                                                 build_condensed_taylor)
    from tinympc_julia_tpu.ops.pallas.adaptive_kernel import (
        make_condensed_adaptive_fused_solver)
    from tinympc_julia_tpu.ops.pallas.condensed_kernel import (
        FusedCarry, make_condensed_fused_solver)
    from tinympc_julia_tpu.parallel.grouped import stack_instances
    from tinympc_julia_tpu.parallel.rebuild import rebuild_bucket_caches

    dtype = jnp.float32
    N = quadrotor.HORIZON
    B = 4096 if QUICK else 16384
    S2 = 1024 if QUICK else 2048   # straggler slots PER BUCKET
    ub = quadrotor.U_HOVER_BOUND
    p = make_problem(jnp.asarray(quadrotor.A, dtype),
                     jnp.asarray(quadrotor.B, dtype),
                     jnp.asarray(np.diag(quadrotor.Q_DIAG), dtype),
                     jnp.asarray(np.diag(quadrotor.R_DIAG), dtype),
                     quadrotor.RHO, N, u_min=-ub, u_max=ub)
    c = precompute_cache(p.A, p.B, p.Q, p.R,
                         jnp.asarray(quadrotor.RHO, dtype))
    tmaps = build_condensed_taylor(p, c)
    # floor == rho0 is the config's invariant (decay below rho0 re-enters
    # the Taylor plateau) — derive it, don't hardcode
    kw = dict(en_input_bound=True, en_state_bound=False,
              controller="termination", taylor_trust=2.0,
              adaptive_rho_min=float(quadrotor.RHO), adaptive_rho_max=1e3)
    fn1 = make_condensed_adaptive_fused_solver(
        np.asarray(p.A), np.asarray(p.B), np.asarray(p.Q), np.asarray(p.R),
        np.asarray(c.Pinf), np.asarray(c.dPinf_drho), N,
        batch_tile=512, max_iter=150, carry_out=True, **kw)

    # exact bucket caches spanning the trust window [rho0, rho0 + 2]
    BUCKETS = tuple(float(quadrotor.RHO) + d for d in (0.0, 1.0, 2.0))
    G = len(BUCKETS)
    bcaches = rebuild_bucket_caches(p, c, BUCKETS)
    bmaps = build_condensed(stack_instances([p] * G), bcaches)
    brho = jnp.asarray(BUCKETS, jnp.float32)
    fn2 = make_condensed_fused_solver(
        12, 4, N, batch_tile=512, max_iter=2500, warm_start=True,
        num_groups=G, bf16_head_iters=256, en_input_bound=True,
        en_state_bound=False)

    rng = np.random.default_rng(1)
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, size=(B, 12)), dtype)
    bounds = (p.u_min, p.u_max, p.x_min, p.x_max)

    from tinympc_julia_tpu.parallel.rebuild import compact_members

    @jax.jit
    def pipeline(x0s):
        _, _, it1, ok1, rho1, carry = fn1(tmaps, *bounds, x0s)
        unconv = ok1 == 0
        # snap each straggler's settled rho onto the bucket grid
        bucket = jnp.argmin(jnp.abs(carry.rho[0][:, None]
                                    - brho[None, :]), axis=1)
        m = unconv[None, :] & (bucket[None, :] == jnp.arange(G)[:, None])
        idx, counts, valid, overflow = compact_members(m, S2)
        gidx = idx.reshape(-1)
        # adaptive carry -> fixed-kernel carry: w2 = [z - y; v - g]
        w2 = jnp.concatenate([carry.z - carry.y, carry.v - carry.g], axis=0)

        def gather(a):
            return jnp.where(valid[None, :], a[:, gidx], 0.0)

        warm = FusedCarry(gather(w2), gather(carry.y), gather(carry.g),
                          gather(carry.v), gather(carry.z))
        x0s2 = jnp.where(valid[:, None], x0s[gidx], 0.0)
        _, _, it2, ok2 = fn2(bmaps, brho, *bounds, x0s2, warm)
        lane_rho = jnp.where(valid, brho[jnp.repeat(jnp.arange(G), S2)],
                             0.0)
        return (it1, ok1, rho1, it2, jnp.where(valid, ok2, 0), lane_rho,
                unconv, valid, overflow)

    (it1, ok1, rho1, it2, ok2v, lrho, unconv, valid,
     overflow) = pipeline(x0s)
    n1 = int(np.sum(np.asarray(ok1)))
    n_straggler = int(np.sum(np.asarray(unconv)))
    n2 = int(np.sum(np.asarray(ok2v)))
    n_conv = n1 + n2
    if np.asarray(overflow).any():
        log(f"quadrotor adaptive: bucket overflow "
            f"{np.asarray(overflow).tolist()}")
    total_iters = float(np.sum(np.asarray(it1))
                        + np.sum(np.asarray(it2)[np.asarray(valid)]))
    t = _device_loop_time(
        pipeline, x0s,
        lambda o: (jnp.sum(o[1]) + jnp.sum(o[4])).astype(jnp.float32), reps)
    rho_all = np.concatenate([np.asarray(rho1)[~np.asarray(unconv)],
                              np.asarray(lrho)[np.asarray(valid)]])
    log(f"quadrotor adaptive-rho: {n_conv}/{B} converged "
        f"({100.0 * n_conv / B:.2f}%), {n_straggler} stragglers "
        f"requantized onto buckets {BUCKETS}, rho span "
        f"[{rho_all.min():.2f}, {rho_all.max():.2f}], "
        f"median {t * 1e3:.2f} ms -> {n_conv / t:.0f} solves/s")
    return dict(solves_per_sec=round(n_conv / t, 1),
                iters_per_sec=round(total_iters / t, 1),
                convergence=round(n_conv / B, 4),
                rho_span=[round(float(rho_all.min()), 4),
                          round(float(rho_all.max()), 4)],
                controller="termination", phase2="bucket-requantized",
                batch=B)


def bench_misset_rho(reps):
    """Adaptive-rho that demonstrably adapts AND is throughput-viable
    (VERDICT r4 item 1): the constrained-cartpole workload (cart position
    bounds, examples/cartpole_example_reference_constrained.jl:16-18) with
    rho0 deliberately mis-set 100x low.  Headline config:

      bucketed  — the bucketed exact-rebuild pipeline on the FUSED path
                  (parallel/rebuild.py): phase-1 fixed-rho0 fused pass,
                  one per-lane termination-residual rho prediction,
                  phase-2 warm continuation on per-bucket exactly-rebuilt
                  caches (the batched analog of re-calling
                  tiny_precompute_and_set_cache, tiny_api.cpp:124-190)

    Context configs on the standard batched path:
      fixed     — rho pinned at the mis-set rho0 (the control)
      reference — the reference's OSQP controller + Taylor update
      rebuild   — termination controller + per-update exact Riccati rebuild
                  nested in the solve loop (the r4 capability demo; wins on
                  convergence, ~100x too slow — the pipeline replaces it)
    """
    import jax
    import jax.numpy as jnp
    from tinympc_julia_tpu import (Settings, init_state, make_problem,
                                   precompute_cache)
    from tinympc_julia_tpu.models import cartpole
    from tinympc_julia_tpu.parallel import broadcast_state, set_x0_batch
    from tinympc_julia_tpu.parallel.batch import solve_batch
    from tinympc_julia_tpu.parallel.rebuild import make_bucketed_rebuild

    dtype = jnp.float32
    N = cartpole.HORIZON
    B = 1024 if QUICK else 4096
    RHO0 = 0.01
    xmax = np.array([2.0, 1e17, 1e17, 1e17])
    p = make_problem(jnp.asarray(cartpole.A, dtype),
                     jnp.asarray(cartpole.B, dtype),
                     jnp.asarray(np.diag(cartpole.Q_DIAG), dtype),
                     jnp.asarray(np.diag(cartpole.R_DIAG), dtype),
                     RHO0, N, u_min=-5.0, u_max=5.0,
                     x_min=jnp.asarray(np.tile(-xmax, (N, 1)), dtype),
                     x_max=jnp.asarray(np.tile(xmax, (N, 1)), dtype))
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(RHO0, dtype))
    rng = np.random.default_rng(5)
    x0s = jnp.asarray(rng.uniform(-1, 1, size=(B, 4))
                      * np.array([1.8, 1.0, 0.4, 0.5]), dtype)
    st = set_x0_batch(broadcast_state(init_state(4, 1, N, dtype), B), x0s)

    base = dict(max_iter=500, en_state_bound=True, en_input_bound=True)
    adapt = dict(adaptive_rho=True, adaptive_rho_controller="termination",
                 adaptive_rho_rebuild=True,
                 adaptive_rho_min=1e-4, adaptive_rho_max=1e4)

    def run_cfg(s, r):
        def run():
            return solve_batch(p, c, s, st)
        _, ca, sol = run()
        t = _median_time(run, r, sync=lambda o: o[2].iter[:8])
        return (int(np.sum(np.asarray(sol.solved))),
                float(np.mean(np.asarray(sol.iter))), t, np.asarray(ca.rho))

    n_fix, it_fix, t_fix, _ = run_cfg(Settings(**base), reps)
    n_ref, it_ref, t_ref, rho_ref = run_cfg(Settings(
        adaptive_rho=True, adaptive_rho_min=1e-4, adaptive_rho_max=1e4,
        **base), reps)
    # the standard rebuild path is ~100x slower — keep its reps minimal
    n_std, it_std, t_std, rho_std = run_cfg(Settings(**adapt, **base),
                                            max(2, reps // 3))

    # the throughput-viable config: bucketed rebuild on the fused path
    s_bkt = Settings(max_iter=500, en_state_bound=True, en_input_bound=True,
                     adaptive_rho_min=1e-4, adaptive_rho_max=1e4)
    pipe = make_bucketed_rebuild(p, c, s_bkt, phase1_iters=50,
                                 straggler_slots=B, phase2_iters=450,
                                 batch_tile=min(2048, B))
    xs, us, iters, solved, rho, overflow = (
        np.asarray(o) for o in pipe.solve(x0s))
    n_bkt = int(solved.sum())
    it_bkt = float(iters.mean())
    if overflow.any():
        log(f"misset bucketed: straggler overflow {overflow.tolist()}")
    t_bkt = _device_loop_time(
        pipe.solve, x0s, lambda o: jnp.sum(o[3]).astype(jnp.float32), reps)

    log(f"misset-rho0 cartpole (rho0={RHO0}, B={B}): "
        f"fixed {n_fix}/{B} @ {it_fix:.0f} iters ({n_fix / t_fix:.0f} "
        f"solves/s) | reference-adaptive {n_ref}/{B} @ {it_ref:.0f} iters, "
        f"rho span [{rho_ref.min():.2g}, {rho_ref.max():.2g}] | "
        f"standard rebuild {n_std}/{B} @ {it_std:.0f} iters "
        f"({n_std / t_std:.0f} solves/s), rho span "
        f"[{rho_std.min():.2g}, {rho_std.max():.2g}] | "
        f"BUCKETED rebuild {n_bkt}/{B} @ {it_bkt:.0f} iters "
        f"({n_bkt / t_bkt:.0f} solves/s), rho span "
        f"[{rho.min():.2g}, {rho.max():.2g}]")
    return dict(solves_per_sec=round(n_bkt / t_bkt, 1),
                convergence=round(n_bkt / B, 4),
                mean_iters=round(it_bkt, 1),
                rho_span=[round(float(rho.min()), 4),
                          round(float(rho.max()), 4)],
                buckets=[round(float(r), 6) for r in pipe.bucket_rhos],
                fixed_control=dict(solves_per_sec=round(n_fix / t_fix, 1),
                                   convergence=round(n_fix / B, 4),
                                   mean_iters=round(it_fix, 1)),
                reference_adaptive=dict(convergence=round(n_ref / B, 4),
                                        mean_iters=round(it_ref, 1)),
                rebuild_standard=dict(solves_per_sec=round(n_std / t_std, 1),
                                      convergence=round(n_std / B, 4),
                                      mean_iters=round(it_std, 1)),
                batch=B, rho0=RHO0)


def bench_misset_rho_quadrotor(reps):
    """The bucketed rebuild pipeline on the quadrotor (generalization of
    the misset row beyond cartpole): rho0 mis-set 100x low (0.05 vs the
    example's 5.0), box input bounds."""
    import jax
    import jax.numpy as jnp
    from tinympc_julia_tpu import Settings, make_problem, precompute_cache
    from tinympc_julia_tpu.models import quadrotor
    from tinympc_julia_tpu.ops.condensed import build_condensed
    from tinympc_julia_tpu.ops.pallas.condensed_kernel import (
        make_condensed_fused_solver)
    from tinympc_julia_tpu.parallel.rebuild import make_bucketed_rebuild

    dtype = jnp.float32
    N = quadrotor.HORIZON
    B = 1024 if QUICK else 4096
    RHO0 = 0.05
    ub = quadrotor.U_HOVER_BOUND
    p = make_problem(jnp.asarray(quadrotor.A, dtype),
                     jnp.asarray(quadrotor.B, dtype),
                     jnp.asarray(np.diag(quadrotor.Q_DIAG), dtype),
                     jnp.asarray(np.diag(quadrotor.R_DIAG), dtype),
                     RHO0, N, u_min=-ub, u_max=ub)
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(RHO0, dtype))
    rng = np.random.default_rng(1)
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, size=(B, 12)), dtype)

    # fixed-rho0 control on the same fused path
    maps = build_condensed(p, c)
    fnf = make_condensed_fused_solver(12, 4, N, batch_tile=512, max_iter=500,
                                      en_input_bound=True,
                                      en_state_bound=False)
    bounds = (p.u_min, p.u_max, p.x_min, p.x_max)
    _, _, itf, okf = fnf(maps, c.rho, *bounds, x0s)
    n_fix = int(np.asarray(okf).sum())
    t_fix = _device_loop_time(
        lambda x: fnf(maps, c.rho, *bounds, x), x0s,
        lambda o: jnp.sum(o[3]).astype(jnp.float32), reps)

    s_bkt = Settings(max_iter=500, en_state_bound=False, en_input_bound=True,
                     adaptive_rho_min=1e-3, adaptive_rho_max=1e3)
    pipe = make_bucketed_rebuild(p, c, s_bkt, phase1_iters=50,
                                 straggler_slots=B, phase2_iters=450,
                                 batch_tile=512)
    _, _, iters, solved, rho, overflow = (
        np.asarray(o) for o in pipe.solve(x0s))
    n_bkt = int(solved.sum())
    if overflow.any():
        log(f"quad misset: straggler overflow {overflow.tolist()}")
    t_bkt = _device_loop_time(
        pipe.solve, x0s, lambda o: jnp.sum(o[3]).astype(jnp.float32), reps)
    log(f"misset-rho0 quadrotor (rho0={RHO0}, B={B}): "
        f"fixed {n_fix}/{B} @ {np.asarray(itf).mean():.0f} iters "
        f"({n_fix / t_fix:.0f} solves/s) | BUCKETED rebuild {n_bkt}/{B} @ "
        f"{iters.mean():.0f} iters ({n_bkt / t_bkt:.0f} solves/s), rho span "
        f"[{rho.min():.2g}, {rho.max():.2g}]")
    return dict(solves_per_sec=round(n_bkt / t_bkt, 1),
                convergence=round(n_bkt / B, 4),
                mean_iters=round(float(iters.mean()), 1),
                rho_span=[round(float(rho.min()), 4),
                          round(float(rho.max()), 4)],
                fixed_control=dict(solves_per_sec=round(n_fix / t_fix, 1),
                                   convergence=round(n_fix / B, 4)),
                batch=B, rho0=RHO0)


def bench_rocket(reps):
    """Rocket landing: box + state/input SOC + affine gravity (BASELINE
    config 4; /root/reference/examples/rocket_landing_constraints.jl:17-62)."""
    import jax
    import jax.numpy as jnp
    from tinympc_julia_tpu import make_problem, precompute_cache, ConeSet
    from tinympc_julia_tpu.models import rocket
    from tinympc_julia_tpu.ops.condensed import build_condensed
    from tinympc_julia_tpu.ops.pallas.condensed_kernel import (
        make_condensed_fused_solver)

    dtype = jnp.float32
    N = rocket.HORIZON
    B = 8192 if QUICK else 65536
    xb = rocket.bounds()
    p = make_problem(
        jnp.asarray(rocket.A, dtype), jnp.asarray(rocket.B, dtype),
        jnp.asarray(np.diag(rocket.Q_DIAG), dtype),
        jnp.asarray(np.diag(rocket.R_DIAG), dtype), rocket.RHO, N,
        f=jnp.asarray(rocket.F, dtype),
        x_min=jnp.asarray(xb[0].T, dtype), x_max=jnp.asarray(xb[1].T, dtype),
        u_min=-10.0, u_max=105.0,
        cones_u=ConeSet(mus=jnp.asarray([rocket.MU_INPUT], dtype),
                        starts=(0,), dims=(3,)),
        cones_x=ConeSet(mus=jnp.asarray([rocket.MU_STATE], dtype),
                        starts=(0,), dims=(3,)))
    Xref, Uref = rocket.reference_trajectory(0)
    p = p.replace(Xref=jnp.asarray(Xref.T, dtype),
                  Uref=jnp.asarray(Uref.T, dtype))
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(rocket.RHO, dtype))
    maps = build_condensed(p, c)
    # precision-staged: 24 bf16 iterations then a warm HIGHEST finish
    # (measured +14% at 100% convergence, docs/DESIGN.md §5); tile 1024 —
    # the carry/warm kernels overflow scoped VMEM at 2048 on this shape
    kw = dict(abs_pri_tol=2e-3, abs_dua_tol=1e-3, en_input_bound=True,
              en_state_bound=True, check_termination=1,
              soc_u=((0, 3, rocket.MU_INPUT),),
              soc_x=((0, 3, rocket.MU_STATE),))
    fn0 = make_condensed_fused_solver(6, 3, N, batch_tile=1024, max_iter=24,
                                      carry_out=True,
                                      precision=jax.lax.Precision.DEFAULT,
                                      **kw)
    fn1 = make_condensed_fused_solver(6, 3, N, batch_tile=1024, max_iter=48,
                                      warm_start=True, **kw)

    rng = np.random.default_rng(2)
    x0s = jnp.asarray(rocket.X_INIT[None, :]
                      * rng.uniform(0.9, 1.1, size=(B, 1)), dtype)
    bounds = (p.u_min, p.u_max, p.x_min, p.x_max)

    @jax.jit
    def run(x0s):
        _, _, it0, ok0, carry = fn0(maps, c.rho, *bounds, x0s)
        xs, us, it1, ok1 = fn1(maps, c.rho, *bounds, x0s, carry)
        return xs, us, jnp.where(ok0 == 1, it0, 24 + it1), \
            jnp.maximum(ok0, ok1)

    _, _, iters, solved = run(x0s)
    n_conv = int(np.sum(np.asarray(solved)))
    total_iters = float(np.sum(np.asarray(iters)))
    t = _device_loop_time(
        run, x0s, lambda o: jnp.sum(o[3]).astype(jnp.float32), reps)
    log(f"rocket SOC: {n_conv}/{B} converged ({100.0 * n_conv / B:.2f}%), "
        f"median {t * 1e3:.2f} ms -> {n_conv / t:.0f} solves/s")
    return dict(solves_per_sec=round(n_conv / t, 1),
                iters_per_sec=round(total_iters / t, 1),
                convergence=round(n_conv / B, 4), batch=B)


def bench_rocket_sweep(reps):
    """Randomized rocket-landing sweep with PER-GROUP cone angles (VERDICT
    r3 item 3b): G distinct thrust/glide cone coefficients
    (rocket_landing_constraints.jl:52-58 semantics) x L lanes on the
    grouped fused kernel — per-group SOC data rides the group grid."""
    import jax
    import jax.numpy as jnp
    from tinympc_julia_tpu import (ConeSet, Settings, make_problem,
                                   precompute_cache)
    from tinympc_julia_tpu.models import rocket
    from tinympc_julia_tpu.parallel.grouped import (GroupedBatchSolver,
                                                    stack_instances)

    dtype = jnp.float32
    N = rocket.HORIZON
    G = 4 if QUICK else 16
    L = 512 if QUICK else 2048
    rng = np.random.default_rng(6)
    xb = rocket.bounds()
    probs, caches = [], []
    for g in range(G):
        mu_u = float(rng.uniform(0.15, 0.35))
        mu_x = float(rng.uniform(0.4, 0.6))
        p = make_problem(
            jnp.asarray(rocket.A, dtype), jnp.asarray(rocket.B, dtype),
            jnp.asarray(np.diag(rocket.Q_DIAG), dtype),
            jnp.asarray(np.diag(rocket.R_DIAG), dtype), rocket.RHO, N,
            f=jnp.asarray(rocket.F, dtype),
            x_min=jnp.asarray(xb[0].T, dtype),
            x_max=jnp.asarray(xb[1].T, dtype),
            u_min=-10.0, u_max=105.0,
            cones_u=ConeSet(mus=jnp.asarray([mu_u], dtype), starts=(0,),
                            dims=(3,)),
            cones_x=ConeSet(mus=jnp.asarray([mu_x], dtype), starts=(0,),
                            dims=(3,)))
        Xref, Uref = rocket.reference_trajectory(0)
        p = p.replace(Xref=jnp.asarray(Xref.T, dtype),
                      Uref=jnp.asarray(Uref.T, dtype))
        c = precompute_cache(p.A, p.B, p.Q, p.R,
                             jnp.asarray(rocket.RHO, dtype))
        probs.append(p)
        caches.append(c)
    gs = GroupedBatchSolver(
        stack_instances(probs), stack_instances(caches),
        Settings(max_iter=100, abs_pri_tol=2e-3, abs_dua_tol=1e-3,
                 en_state_bound=True, en_input_bound=True,
                 en_input_soc=True, en_state_soc=True))
    x0s = jnp.asarray(
        rocket.X_INIT[None, None, :] * rng.uniform(0.9, 1.1, size=(G, L, 1)),
        dtype)
    # batch_tile 1024: at 2048 the carry_out phase-1 kernel's stacked
    # intermediates overflow the ~16 MiB scoped-VMEM stack for this shape.
    # Precision staging (24 bf16 + 48 HIGHEST): measured +18% at 100%
    # convergence; shorter HIGHEST tails (16-24) collapse convergence on
    # this SOC-heavy shape (docs/DESIGN.md §5)
    pipe = gs.make_fused_pipeline(phase0_bf16_iters=24, phase1_iters=48,
                                  straggler_slots=256,
                                  phase2_iters=400, lanes=L,
                                  batch_tile=min(1024, L))

    _, _, iters, solved, overflow = (np.asarray(o) for o in pipe(x0s))
    if overflow.any():
        log(f"rocket sweep: straggler overflow {overflow.tolist()}")
    n_conv = int(solved.sum())
    total_iters = float(iters[solved == 1].sum())
    t = _device_loop_time(
        pipe, x0s, lambda o: jnp.sum(o[3]).astype(jnp.float32), reps)
    log(f"rocket per-group-cones sweep: G={G} cone configs x L={L} lanes, "
        f"{n_conv}/{G * L} converged ({100.0 * n_conv / (G * L):.2f}%), "
        f"median {t * 1e3:.1f} ms -> {n_conv / t:.0f} solves/s")
    return dict(solves_per_sec=round(n_conv / t, 1),
                iters_per_sec=round(total_iters / t, 1),
                convergence=round(n_conv / (G * L), 4), groups=G, lanes=L)


def bench_latency(reps):
    """Small-batch/latency boundary (VERDICT r4 item 5): time-to-solution
    of a single warm dispatch at B=1/64/1024/8192 cartpole solves, vs the
    native C runtime's single-solve time on this host — the reference's
    actual unit of work (examples/cartpole_example_one_solve.jl:22-32).

    Two numbers per batch size: ``wall`` is what a host-driven caller sees
    through the axon tunnel (~10-25 ms dispatch floor dominates small B);
    ``device`` is the on-chip time (device-loop protocol) — the number
    that matters when the caller IS on-device (fused MPC loop, or a
    locally-attached TPU)."""
    import time as _time
    import jax
    import jax.numpy as jnp
    from tinympc_julia_tpu import make_problem, precompute_cache
    from tinympc_julia_tpu.models import cartpole
    from tinympc_julia_tpu.ops.condensed import build_condensed
    from tinympc_julia_tpu.ops.pallas.condensed_kernel import (
        make_condensed_fused_solver)

    dtype = jnp.float32
    N = cartpole.HORIZON
    p = make_problem(jnp.asarray(cartpole.A, dtype),
                     jnp.asarray(cartpole.B, dtype),
                     jnp.asarray(np.diag(cartpole.Q_DIAG), dtype),
                     jnp.asarray(np.diag(cartpole.R_DIAG), dtype),
                     cartpole.RHO, N, u_min=-5.0, u_max=5.0)
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(cartpole.RHO, dtype))
    maps = build_condensed(p, c)
    bounds = (p.u_min, p.u_max, p.x_min, p.x_max)
    rng = np.random.default_rng(0)
    kw = dict(en_input_bound=True, en_state_bound=False,
              relaxation_alpha=1.7, check_termination=4)

    rows = {}
    for B in (1, 64, 1024) + (() if QUICK else (8192,)):
        Bt = 128 if jax.default_backend() == "tpu" else 8
        while Bt < min(B, 2048):
            Bt *= 2
        fn = make_condensed_fused_solver(4, 1, N, batch_tile=min(Bt, 2048),
                                         max_iter=400, **kw)
        x0s = jnp.asarray(rng.uniform(-0.5, 0.5, size=(B, 4)), dtype)
        Bp = max(Bt, ((B + Bt - 1) // Bt) * Bt)
        x0s_p = x0s if Bp == B else jnp.concatenate(
            [x0s, jnp.zeros((Bp - B, 4), dtype)], axis=0)

        def run(x=x0s_p, f=fn):
            return f(maps, c.rho, *bounds, x)

        _, _, iters, ok = run()
        n_conv = int(np.asarray(ok)[:B].sum())
        t_wall = _median_time(run, reps, sync=lambda o: o[3][:1])
        t_dev = _device_loop_time(
            run, x0s_p, lambda o: jnp.sum(o[3]).astype(jnp.float32), reps)
        rows[str(B)] = dict(
            wall_us_per_batch=round(t_wall * 1e6, 1),
            device_us_per_batch=round(t_dev * 1e6, 1),
            device_us_per_solve=round(t_dev * 1e6 / B, 3),
            convergence=round(n_conv / B, 4))
        log(f"latency B={B}: wall {t_wall * 1e3:.2f} ms, device "
            f"{t_dev * 1e6:.0f} us ({t_dev * 1e6 / B:.2f} us/solve), "
            f"{n_conv}/{B} conv")

    # native C runtime: the honest embedded baseline for B=1
    native_row = None
    try:
        from tinympc_julia_tpu.native import NativeSolver
        ns = NativeSolver()
        ns.setup(np.asarray(cartpole.A), np.asarray(cartpole.B), None,
                 np.diag(cartpole.Q_DIAG), np.diag(cartpole.R_DIAG),
                 cartpole.RHO, 4, 1, N)
        ns.update_settings(max_iter=400, check_termination=4)
        ns.set_bound_constraints(np.full((4, N), -1e17), np.full((4, N), 1e17),
                                 np.full((1, N - 1), -5.0),
                                 np.full((1, N - 1), 5.0))
        x0s_h = rng.uniform(-0.5, 0.5, size=(64, 4))
        ns.set_x0(x0s_h[0])
        ns.solve()  # warm the code path
        t0 = _time.perf_counter()
        n_ok = 0
        for i in range(64):
            ns.set_x0(x0s_h[i])
            n_ok += int(ns.solve() == 0)
        t_native = (_time.perf_counter() - t0) / 64
        native_row = dict(us_per_solve=round(t_native * 1e6, 2),
                          convergence=round(n_ok / 64, 4))
        log(f"latency native C (host): {t_native * 1e6:.1f} us/solve "
            f"({n_ok}/64 conv)")
        ns.cleanup()
    except Exception as e:  # native lib unavailable on this host
        log(f"latency: native runtime skipped ({e})")
    return dict(batches=rows, native_host=native_row)


def bench_mpc_loop(reps):
    """Closed-loop MPC steps/s: the all-Pallas fused loop (warm-carry
    chained), cartpole plant (BASELINE config 2;
    /root/reference/examples/cartpole_example_mpc.jl:30-51)."""
    import jax
    import jax.numpy as jnp
    from tinympc_julia_tpu import Settings, make_problem, precompute_cache
    from tinympc_julia_tpu.models import cartpole
    from tinympc_julia_tpu.parallel.mpc import make_fused_mpc_loop

    dtype = jnp.float32
    N = cartpole.HORIZON
    B = 2048 if QUICK else 8192
    n_steps = 100
    p = make_problem(jnp.asarray(cartpole.A, dtype),
                     jnp.asarray(cartpole.B, dtype),
                     jnp.asarray(np.diag(cartpole.Q_DIAG), dtype),
                     jnp.asarray(np.diag(cartpole.R_DIAG), dtype),
                     cartpole.RHO, N, u_min=-5.0, u_max=5.0)
    c = precompute_cache(p.A, p.B, p.Q, p.R, jnp.asarray(cartpole.RHO, dtype))
    s = Settings(max_iter=100, en_state_bound=False, en_input_bound=True,
                 relaxation_alpha=1.7)
    fused = make_fused_mpc_loop(p, c, s, n_steps)
    rng = np.random.default_rng(3)
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, size=(B, 4)), dtype)

    res = fused(x0s)
    conv = float(np.asarray(res.solved).mean())
    t = _device_loop_time(
        fused, x0s, lambda r: jnp.sum(r.solved).astype(jnp.float32), reps,
        target_s=1.0)
    steps = B * n_steps
    log(f"fused MPC loop: {steps} closed-loop steps in {t * 1e3:.1f} ms "
        f"-> {steps / t:.0f} steps/s ({100 * conv:.1f}% solved)")
    return dict(steps_per_sec=round(steps / t, 1),
                convergence=round(conv, 4), batch=B, n_steps=n_steps)


def bench_randomized_sweep(reps):
    """Domain-randomized quadrotor sweep (BASELINE config 5: '64k randomized
    quadrotor instances'): G distinct plants/costs/bounds x L lanes on the
    grouped fused kernel (parallel/grouped.py)."""
    import jax
    import jax.numpy as jnp
    from tinympc_julia_tpu import Settings, make_problem, precompute_cache
    from tinympc_julia_tpu.models import quadrotor
    from tinympc_julia_tpu.parallel.grouped import (GroupedBatchSolver,
                                                    stack_instances)

    dtype = jnp.float32
    N = quadrotor.HORIZON
    G = 4 if QUICK else 64
    L = 512 if QUICK else 1024   # G*L = 64k lanes
    rng = np.random.default_rng(4)
    probs, caches = [], []
    for g in range(G):
        A = np.asarray(quadrotor.A) + rng.normal(scale=2e-3, size=(12, 12))
        Bm = np.asarray(quadrotor.B) * rng.uniform(0.9, 1.1)
        Qd = np.asarray(quadrotor.Q_DIAG) * rng.uniform(0.8, 1.25, size=12)
        Rd = np.asarray(quadrotor.R_DIAG) * rng.uniform(0.8, 1.25, size=4)
        ub = rng.uniform(0.4, 0.6)
        p = make_problem(jnp.asarray(A, dtype), jnp.asarray(Bm, dtype),
                         jnp.asarray(np.diag(Qd), dtype),
                         jnp.asarray(np.diag(Rd), dtype), quadrotor.RHO, N,
                         u_min=-ub, u_max=ub)
        c = precompute_cache(p.A, p.B, p.Q, p.R,
                             jnp.asarray(quadrotor.RHO, dtype))
        probs.append(p)
        caches.append(c)
    gs = GroupedBatchSolver(
        stack_instances(probs), stack_instances(caches),
        Settings(max_iter=300, en_state_bound=False, en_input_bound=True,
                 relaxation_alpha=1.7, check_termination=4))
    x0s = jnp.asarray(rng.uniform(-0.25, 0.25, size=(G, L, 12)), dtype)
    # two-phase per-group straggler pipeline (a VMEM tile runs until its
    # slowest lane converges; measured ~4% useful iterations single-phase),
    # timed on-device like every other config (solve_batch's numpy
    # conversion would move ~80 MB of trajectories through the remote
    # tunnel per rep).  Precision staging on BOTH ends (128 bf16 bulk +
    # 32 HIGHEST, then a 512-iteration bf16 head inside the straggler
    # continuation — stragglers are exactly the lanes with hundreds of
    # iterations left): measured 1.13M solves/s at 100% convergence vs
    # 536k unstaged (docs/DESIGN.md §5)
    pipe = gs.make_fused_pipeline(phase0_bf16_iters=128, phase1_iters=32,
                                  straggler_slots=256,
                                  phase2_iters=1500, phase2_bf16_head=512,
                                  lanes=L)

    _, _, iters, solved, overflow = (np.asarray(o) for o in pipe(x0s))
    if overflow.any():
        log(f"randomized sweep: straggler overflow {overflow.tolist()}")
    n_conv = int(solved.sum())
    total_iters = float(iters[solved == 1].sum())
    t = _device_loop_time(
        pipe, x0s, lambda o: jnp.sum(o[3]).astype(jnp.float32), reps)
    log(f"randomized quadrotor sweep: G={G} problems x L={L} lanes, "
        f"{n_conv}/{G * L} converged ({100.0 * n_conv / (G * L):.2f}%), "
        f"median {t * 1e3:.1f} ms -> {n_conv / t:.0f} solves/s")
    return dict(solves_per_sec=round(n_conv / t, 1),
                iters_per_sec=round(total_iters / t, 1),
                convergence=round(n_conv / (G * L), 4), groups=G, lanes=L)


def main():
    import jax
    try:  # persistent compile cache: first-compile through the remote
        # tunnel is slow (minutes); caching is compile-time only and does
        # not affect the timed warm executions
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    log(f"bench: backend={jax.default_backend()} devices={jax.device_count()}"
        f" quick={QUICK} mesh={MESH}")
    reps = 5 if QUICK else 20
    reps_extra = 3 if QUICK else 10

    cart = bench_cartpole(reps)
    extra = {"cartpole": cart}
    if not MESH:  # extras measure single-chip configs
        extra["quadrotor_adaptive"] = bench_quadrotor_adaptive(reps_extra)
        extra["misset_rho_adaptive"] = bench_misset_rho(reps_extra)
        extra["misset_rho_quadrotor"] = bench_misset_rho_quadrotor(
            reps_extra)
        extra["rocket_soc"] = bench_rocket(reps_extra)
        extra["rocket_pergroup_cone_sweep"] = bench_rocket_sweep(reps_extra)
        extra["latency"] = bench_latency(reps_extra)
        extra["mpc_loop_fused"] = bench_mpc_loop(reps_extra)
        extra["randomized_quadrotor_sweep"] = bench_randomized_sweep(
            reps_extra)

    # per-chip headline: whole-mesh throughput divided by device count in
    # --mesh mode so vs_baseline stays a per-chip comparison
    per_chip = cart["solves_per_sec"] / cart.get("devices", 1)
    print(json.dumps({
        "metric": "converged_cartpole_mpc_solves_per_sec_per_chip",
        "value": round(per_chip, 1),
        "unit": "solves/s/chip",
        "vs_baseline": round(per_chip / PER_CHIP_TARGET, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
