"""HBM footprint of the scenario-parallel MPC program WITHOUT executing it.

The 8192-scenario x 12-iters/tick monolithic MPC run crashed the TPU worker
twice (docs/SCALING.md §3b, round 3).  This probe compiles the exact closed-
loop program at a sweep of (scenarios, iters/tick) and prints the compiler's
memory analysis (argument/output/temp/peak bytes), so the crash boundary can
be attributed to measured numbers instead of "suspected HBM pressure".

Compile-only: nothing is launched on the chip, so probing past the crash
boundary is safe.

Usage: python tools/probe_mpc_memory.py [scen:iters ...]
       default sweep: 8192:8 8192:12 4096:12
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def probe(n_scen, tick_iters, n_steps=10, horizon=40):
    import dataclasses

    import numpy as np

    from dcol_tpu.solver import mpc
    from dcol_tpu.systems import quadrotor

    sys_, params, X0, U0, cfg = quadrotor.make_problem(
        dtype=jnp.float32, N=horizon)
    cfg = dataclasses.replace(cfg, max_iters=tick_iters)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        np.asarray(X0[0])[None] + rng.normal(0, 0.02, (n_scen, sys_.nx)),
        jnp.float32)
    one = lambda x0: mpc.mpc_run(sys_, params, cfg, x0, U0, n_steps)
    lowered = jax.jit(jax.vmap(one)).lower(x0s)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    row = {"scenarios": n_scen, "iters_per_tick": tick_iters,
           "steps": n_steps, "horizon_N": horizon}
    if ma is None:
        row["memory_analysis"] = None
        return row
    for k in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "generated_code_size_in_bytes",
              "alias_size_in_bytes"):
        v = getattr(ma, k, None)
        if v is not None:
            row[k.replace("_in_bytes", "_mb")] = round(v / 2**20, 1)
    tot = sum(getattr(ma, k, 0) or 0
              for k in ("argument_size_in_bytes", "output_size_in_bytes",
                        "temp_size_in_bytes",
                        "generated_code_size_in_bytes"))
    row["total_hbm_mb"] = round(tot / 2**20, 1)
    return row


def main():
    cases = [tuple(int(x) for x in a.split(":")) for a in sys.argv[1:]] or \
        [(8192, 8), (8192, 12), (4096, 12)]
    for n, it in cases:
        row = probe(n, it)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
