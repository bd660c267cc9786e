"""Closed-loop MPC throughput: scenario-parallel receding-horizon quadrotor
(the BASELINE.json multi-host MPC config; single-host slice of it).

On a multi-device mesh (real chips, or the virtual 8-device CPU mesh used by
tests — see tests/conftest.py) the scenario batch is sharded over the
'scenario' axis, so the same script records both the one-chip TPU number and
the 8192-scenario sharded dryrun artifact (BASELINE.json config #5 analogue).

Usage: python benchmarks/bench_mpc.py [--block B] [--segment S]
       [n_scenarios] [n_steps] [horizon_N] [max_iters_per_tick]

``--block B``: lax.map the closed loop over B-scenario blocks instead of one
monolithic vmap — bounds the SOLVER'S per-block working set (line-search
candidate live ranges etc.) to a block's worth and keeps kernels at the
throughput-optimal width.  Note the stacked OUTPUT (all n_scen closed-loop
trajectories) is still materialized in full; blocking only helps when solver
intermediates, not outputs, dominate HBM (see docs/SCALING.md §3b for the
measured footprints of the 8192x12 case).

``--segment S``: run the closed loop S steps per DISPATCH, carrying
``MpcResult.final`` (resume_from) across dispatches — zero recompute, same
trajectory.  Bounds per-dispatch device runtime and gives the closed loop
restartable boundaries (docs/SCALING.md §3b: heavy multi-minute MPC
dispatches can crash this environment's TPU worker; shown NOT to be memory,
iteration budget, or any single dispatch's duration).

``--ckpt DIR``: with --segment, snapshot each segment's MpcCarry to
DIR/seg_<k>.npz and, on start, RESUME from the latest snapshot found there —
a crashed worker (or killed process) loses at most one segment of work.
This is the elastic-recovery path for long closed loops (SURVEY.md §5).

Timing note: ``block_until_ready()`` is a NO-OP over the axon TPU relay, so
every timed region ends with a real device fetch (``jax.device_get``).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    from dcol_tpu.parallel.mesh import scenario_mesh
    from dcol_tpu.solver import mpc
    from dcol_tpu.systems import quadrotor
    from jax.sharding import NamedSharding, PartitionSpec as P

    argv = sys.argv[1:]
    usage = ("usage: bench_mpc.py [--block B] [--segment S] [--track]"
             " [n_scenarios] [n_steps] [horizon_N] [max_iters_per_tick]")

    def flag(name):
        if name not in argv:
            return None
        i = argv.index(name)
        if i + 1 >= len(argv) or not argv[i + 1].isdigit() \
                or int(argv[i + 1]) <= 0:
            sys.exit(usage)
        v = int(argv[i + 1])
        del argv[i:i + 2]
        return v

    tracked = "--track" in argv
    if tracked:
        argv.remove("--track")
    block = flag("--block")
    segment = flag("--segment")
    if block is not None and segment is not None:
        sys.exit("--block and --segment are mutually exclusive (the "
                 "segmented closed loop dispatches one full-width vmap per "
                 "segment); pick one")
    ckpt_dir = None
    if "--ckpt" in argv:
        i = argv.index("--ckpt")
        if i + 1 >= len(argv):
            sys.exit(usage)
        ckpt_dir = argv[i + 1]
        del argv[i:i + 2]
    n_scen = int(argv[0]) if len(argv) > 0 else 8
    n_steps = int(argv[1]) if len(argv) > 1 else 10
    horizon = int(argv[2]) if len(argv) > 2 else 40
    tick_iters = int(argv[3]) if len(argv) > 3 else 8
    n_dev = jax.device_count()
    print(f"devices: {n_dev} x {jax.devices()[0].platform}", file=sys.stderr)
    sys_, params, X0, U0, cfg = quadrotor.make_problem(
        dtype=jnp.float32, N=horizon)
    cfg = dataclasses.replace(cfg, max_iters=tick_iters)  # warm-started ticks

    import numpy as np

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.asarray(X0[0])[None] + rng.normal(0, 0.02, (n_scen, sys_.nx)),
        jnp.float32)
    sharded = n_dev > 1 and n_scen % n_dev == 0
    if sharded:
        mesh = scenario_mesh()
        x0s = jax.device_put(x0s, NamedSharding(mesh, P("scenario", None)))

    xref_path = None
    if tracked:
        # Sliding reachable reference (--track): the offline CONVERGED plan
        # at the full reference horizon (N=100, collision-free, dynamically
        # feasible) becomes the tracked path; tick k regulates to its
        # [k, k+horizon) window.  Every window end is then actually
        # attainable within the horizon, so per-tick convio measures SOLVER
        # quality — unlike fixed-goal regulation, where the goal-gap term of
        # a ~15 m-away goal dominates convio on a 3.2 s horizon
        # (docs/SCALING.md §3c, round-4 sweep).
        from dcol_tpu.parallel.batch import solve_single

        sys_f, params_f, X0_f, U0_f, cfg_f = quadrotor.make_problem(
            dtype=jnp.float32)  # reference horizon N=100
        st_off = solve_single(sys_f, params_f, cfg_f, X0_f, U0_f)
        ok = bool(jax.device_get(st_off.converged))
        print(f"offline plan: converged={ok}, "
              f"iters={int(jax.device_get(st_off.iter))}", file=sys.stderr)
        assert ok, "offline reference plan must converge"
        path = jax.device_get(st_off.X)
        need = n_steps + horizon
        if need > path.shape[0]:
            import numpy as _np
            path = _np.concatenate(
                [path, _np.repeat(path[-1:], need - path.shape[0], axis=0)])
        xref_path = jnp.asarray(path[:need], jnp.float32)

    one = lambda x0: mpc.mpc_run(sys_, params, cfg, x0, U0, n_steps,
                                 xref_path=xref_path)
    steps_executed = n_steps  # segmented resume overwrites (see run below)
    if segment is not None and segment < n_steps and n_steps % segment == 0:
        # segmented dispatches: S steps per XLA execution, resume state
        # carried across dispatches (bounds per-dispatch device runtime)
        n_seg = n_steps // segment
        run_first = jax.jit(jax.vmap(
            lambda x0: mpc.mpc_run(sys_, params, cfg, x0, U0, segment,
                                   xref_path=xref_path)))
        # k0 is a traced scalar: ONE compiled program serves every segment
        run_next = jax.jit(jax.vmap(
            lambda c, k0: mpc.mpc_run(sys_, params, cfg, c.x, U0, segment,
                                      resume_from=c, xref_path=xref_path,
                                      k0=k0),
            in_axes=(0, None)))

        def seg_path(k):
            import os
            return os.path.join(ckpt_dir, f"seg_{k}.npz")

        def save_carry(k, carry):
            import os

            import numpy as np
            os.makedirs(ckpt_dir, exist_ok=True)
            np.savez(seg_path(k),
                     **{f: np.asarray(getattr(carry, f))
                        for f in mpc.MpcCarry._fields})

        def load_latest():
            """(segment index to resume AFTER, carry) from the newest
            snapshot, or (0, None)."""
            import os

            import numpy as np
            if ckpt_dir is None or not os.path.isdir(ckpt_dir):
                return 0, None
            done = sorted(int(f[4:-4]) for f in os.listdir(ckpt_dir)
                          if f.startswith("seg_") and f.endswith(".npz"))
            if not done:
                return 0, None
            k = done[-1]
            d = np.load(seg_path(k))
            return k + 1, mpc.MpcCarry(
                **{f: jnp.asarray(d[f]) for f in mpc.MpcCarry._fields})

        def run(x0s):
            nonlocal steps_executed
            k0, carry = (0, None) if ckpt_dir is None else load_latest()
            if carry is not None:
                print(f"resuming after segment {k0 - 1} from {ckpt_dir}",
                      file=sys.stderr)
            if k0 >= n_seg:
                sys.exit(f"all {n_seg} segments already checkpointed in "
                         f"{ckpt_dir}; clear it for a fresh run")
            steps_executed = (n_seg - k0) * segment
            outs = []
            for k in range(k0, n_seg):
                out = run_first(x0s) if carry is None else run_next(
                    carry, jnp.int32(k * segment))
                carry = out.final
                if ckpt_dir is not None:
                    jax.block_until_ready(carry.x)
                    save_carry(k, carry)
                outs.append(out)
            x_app = jnp.concatenate(
                [outs[0].X_applied] + [o.X_applied[:, 1:] for o in outs[1:]],
                axis=1)
            cat = lambda get: jnp.concatenate([get(o) for o in outs], axis=1)
            return mpc.MpcResult(
                x_app, cat(lambda o: o.U_applied), cat(lambda o: o.iters),
                cat(lambda o: o.converged), cat(lambda o: o.cost),
                cat(lambda o: o.convio), cat(lambda o: o.h_applied),
                cat(lambda o: o.kmax), outs[-1].final)
    elif block is not None and n_scen > block and n_scen % block == 0 \
            and not sharded:
        segment = None
        nb = n_scen // block

        def run_blocked(x0s):
            out = jax.lax.map(jax.vmap(one),
                              x0s.reshape(nb, block, x0s.shape[-1]))
            return jax.tree_util.tree_map(
                lambda a: a.reshape((n_scen,) + a.shape[2:]), out)

        run = jax.jit(run_blocked)
    else:
        block = segment = None
        run = jax.jit(jax.vmap(one))
    if ckpt_dir is not None:
        # crash-recovery mode: ONE (possibly resumed) run; timing covers it
        t0 = time.time()
        out = run(x0s)
        jax.device_get(out.iters[0])
    else:
        out = run(x0s)
        jax.device_get(out.iters[0])  # real device sync (compile + 1st run)
        t0 = time.time()
        out = run(x0s)
    mean_iters, conv_frac = jax.device_get(jnp.stack([
        jnp.mean(out.iters.astype(jnp.float32)),
        jnp.mean(out.converged.astype(jnp.float32))]))
    wall = time.time() - t0  # clock stops at the fused metrics fetch
    # quality evidence (untimed): per-tick plan violation, collision margin
    # at the applied states, and closed-loop goal error — anytime ticks only
    # count if the plans are good (docs/SCALING.md §3b)
    # tracked mode: the closed loop should sit at the path's tick-n_steps
    # point, not at the (far) fixed goal
    xg = (xref_path[n_steps][0:3] if tracked
          else params["Xref"][-1][0:3])
    f32 = jnp.float32
    quality = jax.device_get(jnp.stack([
        jnp.all(jnp.isfinite(out.X_applied)).astype(f32),
        jnp.mean(out.convio.astype(f32)),
        jnp.max(out.convio).astype(f32),
        jnp.mean((out.convio < 1e-4).astype(f32)),     # offline certificate
        jnp.mean((out.convio < 1e-2).astype(f32)),
        jnp.mean((out.h_applied <= 0.0).astype(f32)),  # collision-free frac
        jnp.max(out.h_applied).astype(f32),
        jnp.mean(jnp.linalg.norm(                      # final goal distance
            out.X_applied[..., -1, 0:3] - xg, axis=-1)).astype(f32),
        # nanmean: a member frozen by a late f32 breakdown reports kmax=NaN
        # without poisoning the aggregate (its converged flag is the signal)
        jnp.nanmean(out.kmax.astype(f32)),
    ]))
    (finite, mean_convio, max_convio, certified_frac, convio2_frac,
     collision_free_frac, max_h_applied, mean_goal_err, mean_kmax) = quality
    # on a --ckpt resumed run only (n_seg - k0) segments actually execute;
    # wall, ticks/s and the quality aggregates all cover exactly those
    ticks = n_scen * steps_executed
    try:  # measured device HBM (peak includes the solve's live ranges)
        ms = jax.local_devices()[0].memory_stats() or {}
        peak_mb = round(ms.get("peak_bytes_in_use", 0) / 2**20, 1)
    except Exception:
        peak_mb = None
    print(json.dumps({
        "scenarios": n_scen, "steps": n_steps, "horizon_N": horizon,
        "max_iters_per_tick": tick_iters,
        "devices": n_dev, "sharded": sharded, "block": block,
        "segment": segment, "ckpt": ckpt_dir is not None,
        "tracked": tracked,
        "steps_executed": steps_executed,
        "wall_s": round(wall, 3),
        "mpc_ticks_per_s": round(ticks / wall, 1),
        "finite": bool(finite),
        "mean_solve_iters": round(float(mean_iters), 2),
        "converged_tick_frac": round(float(conv_frac), 3),
        "mean_plan_convio": round(float(mean_convio), 6),
        "max_plan_convio": round(float(max_convio), 5),
        "tick_frac_convio_lt_1e4": round(float(certified_frac), 3),
        "tick_frac_convio_lt_1e2": round(float(convio2_frac), 3),
        "collision_free_tick_frac": round(float(collision_free_frac), 4),
        "max_h_applied": round(float(max_h_applied), 5),
        "mean_final_goal_err_m": round(float(mean_goal_err), 4),
        "mean_kmax": round(float(mean_kmax), 5),
        "device_peak_hbm_mb": peak_mb,
    }))


if __name__ == "__main__":
    main()
