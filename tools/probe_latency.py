"""Single-solve (batch-1) latency probe: compare solver configurations on
the real chip to pick bench.py's latency mode.

Configs: default grouped kernels / merged single padded kernel
(ProximityOptions.merge_groups) / XLA backend.  p50 of 5 solves each.

Usage: python tools/probe_latency.py [config ...]
       configs: grouped merged xla (default: all)
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def measure(name, make_kwargs, reps=5):
    from dcol_tpu.parallel.batch import perturb_scenarios, solve_batch
    from dcol_tpu.systems import quadrotor

    sys_, params, X0, U0, cfg = quadrotor.make_problem(
        dtype=jnp.float32, **make_kwargs)
    t0 = time.time()
    p1, x1, u1 = perturb_scenarios(params, X0, U0, n=1, seed=9, x0_sigma=0.02)
    st = solve_batch(sys_, p1, cfg, x1, u1)
    conv = int(jax.device_get(jnp.sum(st.converged)))
    print(f"{name}: compile+first {time.time()-t0:.1f}s, conv {conv}/1",
          file=sys.stderr, flush=True)
    lats = []
    for r in range(reps):
        p1, x1, u1 = perturb_scenarios(params, X0, U0, n=1, seed=10 + r,
                                       x0_sigma=0.02)
        t0 = time.time()
        st = solve_batch(sys_, p1, cfg, x1, u1)
        jax.device_get(st.converged)
        lats.append(time.time() - t0)
    p50 = statistics.median(lats)
    print(f"{name}: p50 {p50*1e3:.0f} ms "
          f"(all: {[round(l*1e3) for l in lats]} ms)", flush=True)
    return p50


CONFIGS = {
    "grouped": {},
    "merged": {"merge_groups": True},
    "xla": {"backend": "xla"},
    "merged_xla": {"merge_groups": True, "backend": "xla"},
}


def main():
    names = sys.argv[1:] or ["grouped", "merged", "xla"]
    out = {}
    for n in names:
        out[n] = measure(n, CONFIGS[n])
    print({k: round(v, 3) for k, v in out.items()}, flush=True)


if __name__ == "__main__":
    main()
