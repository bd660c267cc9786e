"""Scenario-batch scaling: quadrotor ALTRO solves/s vs. batch size, plus the
sharded-mesh path (scaling-efficiency report, BASELINE.md north star).

Usage: python benchmarks/bench_scaling.py [--block B] [batch1 batch2 ...]
On a multi-device mesh the batch is sharded over the 'scenario' axis.
``--block B`` runs each batch through solve_batch_blocked (lax.map over
B-scenario blocks) instead of one monolithic vmap — bounds the lock-step
straggler tail to a block and keeps kernels at the throughput-optimal width.

Timing note: ``block_until_ready()`` is a NO-OP over the axon TPU relay, so
every timed region ends with a real device fetch (``jax.device_get``) before
the clock is read.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    from dcol_tpu.parallel.batch import (perturb_scenarios, solve_batch,
                                         solve_batch_blocked)
    from dcol_tpu.parallel.mesh import scenario_mesh, shard_scenarios
    from dcol_tpu.systems import quadrotor

    argv = sys.argv[1:]
    block = None
    if "--block" in argv:
        i = argv.index("--block")
        if i + 1 >= len(argv) or not argv[i + 1].lstrip("-").isdigit():
            sys.exit("usage: bench_scaling.py [--block B] [batch1 batch2 ...]")
        block = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    batches = [int(a) for a in argv] or [8, 16, 32, 64]
    n_dev = jax.device_count()
    print(f"devices: {n_dev} x {jax.devices()[0].platform}", flush=True)
    sys_, params, X0, U0, cfg = quadrotor.make_problem(dtype=jnp.float32)
    mesh = scenario_mesh() if n_dev > 1 else None

    results = []
    for b in batches:
        # effective block: None when the monolithic vmap actually runs
        # (batch <= block, non-divisible, or sharded — reshaping a sharded
        # scenario axis into (nb, block) would split the sharded dim and
        # force resharding, an untested interaction; see bench_mpc.py)
        eff_block = (block if block is not None and b > block
                     and b % block == 0 and mesh is None else None)
        if eff_block is not None:
            run = lambda p, x, u: solve_batch_blocked(
                sys_, p, cfg, x, u, block=eff_block)
        else:
            run = lambda p, x, u: solve_batch(sys_, p, cfg, x, u)
        def make(seed):
            pb, xb, ub = perturb_scenarios(
                params, X0, U0, n=b, seed=seed, x0_sigma=0.02)
            if mesh is not None and b % n_dev == 0:
                pb, xb, ub = shard_scenarios(mesh, pb, xb, ub)
            return pb, xb, ub

        def fetch(st):
            # ONE fused fetch (each device_get is a full relay RTT)
            return jax.device_get(jnp.stack(
                [jnp.sum(st.converged).astype(jnp.float32),
                 jnp.mean(st.iter.astype(jnp.float32))]))

        reps = 3
        inputs = [make(r) for r in range(reps + 1)]
        t0 = time.time()
        pb, xb, ub = inputs[0]
        c0, _ = fetch(run(pb, xb, ub))  # compile + warm
        print(f"batch {b}: compile+warm {time.time()-t0:.1f}s, "
              f"converged {int(c0)}/{b}"
              + (f" (block {eff_block})" if eff_block else " (monolithic)"),
              flush=True)

        convs, iters_mean, walls = [], [], []
        for r in range(reps):
            pb, xb, ub = inputs[r + 1]
            t0 = time.time()
            c, mi = fetch(run(pb, xb, ub))
            walls.append(time.time() - t0)
            convs.append(int(c))
            iters_mean.append(float(mi))
        walls.sort()
        wall = walls[len(walls) // 2]  # median, robust to relay hiccups
        row = {"batch": b, "block": eff_block, "wall_s": round(wall, 3),
               "walls_all_s": [round(w, 3) for w in walls],
               "solves_per_s": round(b / wall, 2),
               "converged": convs[-1],
               "mean_iters": round(sum(iters_mean) / reps, 1)}
        results.append(row)
        print(json.dumps(row), flush=True)
    print("ALL:", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
