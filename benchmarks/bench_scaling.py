"""Scenario-batch scaling: quadrotor ALTRO solves/s vs. batch size, plus the
sharded-mesh path (scaling-efficiency report, BASELINE.md north star).

Usage: python benchmarks/bench_scaling.py [batch1 batch2 ...]
On a multi-device mesh the batch is sharded over the 'scenario' axis.
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
    from dcol_tpu.parallel.batch import perturb_scenarios, solve_batch
    from dcol_tpu.parallel.mesh import scenario_mesh, shard_scenarios
    from dcol_tpu.systems import quadrotor

    batches = [int(a) for a in sys.argv[1:]] or [8, 16, 32, 64]
    n_dev = jax.device_count()
    print(f"devices: {n_dev} x {jax.devices()[0].platform}")
    sys_, params, X0, U0, cfg = quadrotor.make_problem(dtype=jnp.float32)
    mesh = scenario_mesh() if n_dev > 1 else None

    results = []
    for b in batches:
        params_b, X0_b, U0_b = perturb_scenarios(
            params, X0, U0, n=b, seed=0, x0_sigma=0.02)
        if mesh is not None and b % n_dev == 0:
            params_b, X0_b, U0_b = shard_scenarios(mesh, params_b, X0_b, U0_b)
        st = solve_batch(sys_, params_b, cfg, X0_b, U0_b)
        st.X.block_until_ready()
        t0 = time.time()
        reps = 3
        for r in range(reps):
            params_b, X0_b, U0_b = perturb_scenarios(
                params, X0, U0, n=b, seed=r + 1, x0_sigma=0.02)
            if mesh is not None and b % n_dev == 0:
                params_b, X0_b, U0_b = shard_scenarios(
                    mesh, params_b, X0_b, U0_b)
            st = solve_batch(sys_, params_b, cfg, X0_b, U0_b)
            st.X.block_until_ready()
        wall = (time.time() - t0) / reps
        row = {"batch": b, "wall_s": round(wall, 3),
               "solves_per_s": round(b / wall, 2),
               "converged": int(jnp.sum(st.converged)),
               "mean_iters": round(float(jnp.mean(st.iter)), 1)}
        results.append(row)
        print(json.dumps(row))


if __name__ == "__main__":
    main()
