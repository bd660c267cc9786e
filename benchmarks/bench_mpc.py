"""Closed-loop MPC throughput: scenario-parallel receding-horizon quadrotor
(the BASELINE.json multi-host MPC config, single-host slice of it).

Usage: python benchmarks/bench_mpc.py [n_scenarios] [n_steps]
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
    from dcol_tpu.solver import mpc
    from dcol_tpu.systems import quadrotor

    n_scen = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    sys_, params, X0, U0, cfg = quadrotor.make_problem(
        dtype=jnp.float32, N=40)
    cfg = dataclasses.replace(cfg, max_iters=8)  # warm-started ticks

    import numpy as np

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.asarray(X0[0])[None] + rng.normal(0, 0.02, (n_scen, sys_.nx)),
        jnp.float32)

    run = jax.jit(jax.vmap(
        lambda x0: mpc.mpc_run(sys_, params, cfg, x0, U0, n_steps)))
    out = run(x0s)
    out.X_applied.block_until_ready()
    t0 = time.time()
    out = run(x0s)
    out.X_applied.block_until_ready()
    wall = time.time() - t0
    ticks = n_scen * n_steps
    print(json.dumps({
        "scenarios": n_scen, "steps": n_steps,
        "wall_s": round(wall, 3),
        "mpc_ticks_per_s": round(ticks / wall, 1),
        "finite": bool(jnp.all(jnp.isfinite(out.X_applied))),
        "mean_solve_iters": round(float(jnp.mean(out.iters)), 2),
    }))


if __name__ == "__main__":
    main()
