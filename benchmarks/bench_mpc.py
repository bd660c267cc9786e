"""Closed-loop MPC throughput: scenario-parallel receding-horizon quadrotor
(the BASELINE.json multi-host MPC config; single-host slice of it).

On a multi-device mesh (real chips, or the virtual 8-device CPU mesh used by
tests — see tests/conftest.py) the scenario batch is sharded over the
'scenario' axis, so the same script records both the one-chip TPU number and
the 8192-scenario sharded dryrun artifact (BASELINE.json config #5 analogue).

Usage: python benchmarks/bench_mpc.py [--block B] [n_scenarios] [n_steps]
       [horizon_N] [max_iters_per_tick]

``--block B``: lax.map the closed loop over B-scenario blocks instead of one
monolithic vmap — bounds the SOLVER'S per-block working set (line-search
candidate live ranges etc.) to a block's worth and keeps kernels at the
throughput-optimal width.  Note the stacked OUTPUT (all n_scen closed-loop
trajectories) is still materialized in full; blocking only helps when solver
intermediates, not outputs, dominate HBM (see docs/SCALING.md §3b for the
measured footprints of the 8192x12 case).

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
    block = None
    if "--block" in argv:
        i = argv.index("--block")
        if i + 1 >= len(argv) or not argv[i + 1].lstrip("-").isdigit():
            sys.exit("usage: bench_mpc.py [--block B] [n_scenarios] [n_steps]"
                     " [horizon_N] [max_iters_per_tick]")
        block = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
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

    one = lambda x0: mpc.mpc_run(sys_, params, cfg, x0, U0, n_steps)
    if block is not None and n_scen > block and n_scen % block == 0 \
            and not sharded:
        nb = n_scen // block

        def run_blocked(x0s):
            out = jax.lax.map(jax.vmap(one),
                              x0s.reshape(nb, block, x0s.shape[-1]))
            return jax.tree_util.tree_map(
                lambda a: a.reshape((n_scen,) + a.shape[2:]), out)

        run = jax.jit(run_blocked)
    else:
        block = None
        run = jax.jit(jax.vmap(one))
    out = run(x0s)
    jax.device_get(out.iters[0])  # real device sync (compile + first run)
    t0 = time.time()
    out = run(x0s)
    mean_iters, conv_frac = jax.device_get(jnp.stack([
        jnp.mean(out.iters.astype(jnp.float32)),
        jnp.mean(out.converged.astype(jnp.float32))]))
    wall = time.time() - t0  # clock stops at the fused metrics fetch
    # quality evidence (untimed): per-tick plan violation, collision margin
    # at the applied states, and closed-loop goal error — anytime ticks only
    # count if the plans are good (docs/SCALING.md §3b)
    xg = params["Xref"][-1][0:3]
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
        jnp.mean(out.kmax.astype(f32)),
    ]))
    (finite, mean_convio, max_convio, certified_frac, convio2_frac,
     collision_free_frac, max_h_applied, mean_goal_err, mean_kmax) = quality
    ticks = n_scen * n_steps
    print(json.dumps({
        "scenarios": n_scen, "steps": n_steps, "horizon_N": horizon,
        "max_iters_per_tick": tick_iters,
        "devices": n_dev, "sharded": sharded, "block": block,
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
    }))


if __name__ == "__main__":
    main()
