"""On-chip benchmark for the piano-mover and cone-through-wall systems
(BASELINE.json configs #1-2; the reference times all three systems —
Report.pdf §6.1 Table 5, piano_mover.prof / cone.prof — so this repo
publishes all three too; the quadrotor headline lives in bench.py).

Per system: batch-64 throughput (median of 5) + single-solve p50 latency
(median of 5, replicated-batch-8 ``solve_single``).  One JSON line per
system on stdout; progress on stderr.

Usage: python benchmarks/bench_systems.py [piano|cone|both] [batch]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp

# reference cProfile totals for one full solve (BASELINE.md / SURVEY.md §6)
REF_SECONDS = {"piano_mover": 108.3, "coneThroughWall": 307.9}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_system(name, mod, batch, sigma=0.02):
    from dcol_tpu.parallel.batch import (perturb_scenarios, solve_batch,
                                         solve_single)

    sys_, params, X0, U0, cfg = mod.make_problem(dtype=jnp.float32)
    log(f"[{name}] N={sys_.N} nx={sys_.nx} ncx={sys_.ncx} batch={batch} "
        f"sigma={sigma}")

    pb0, xb0, ub0 = perturb_scenarios(params, X0, U0, n=batch, seed=0,
                                      x0_sigma=sigma)
    t0 = time.time()
    st = solve_batch(sys_, pb0, cfg, xb0, ub0)
    n_conv = int(jax.device_get(jnp.sum(st.converged)))
    log(f"[{name}] compile+first solve: {time.time() - t0:.1f}s, "
        f"converged {n_conv}/{batch}")

    def fetch_stats(st):
        return jax.device_get(jnp.stack(
            [jnp.sum(st.converged).astype(jnp.float32),
             jnp.mean(st.iter.astype(jnp.float32))]))

    reps = 5
    inputs = [perturb_scenarios(params, X0, U0, n=batch, seed=r + 1,
                                x0_sigma=sigma) for r in range(reps + 1)]
    pb, xb, ub = inputs[0]
    fetch_stats(solve_batch(sys_, pb, cfg, xb, ub))  # untimed warm rep
    walls, iters, convs = [], [], []
    for r in range(reps):
        pb, xb, ub = inputs[r + 1]
        t0 = time.time()
        st = solve_batch(sys_, pb, cfg, xb, ub)
        c, mi = fetch_stats(st)
        walls.append(time.time() - t0)
        iters.append(float(mi))
        convs.append(int(c))
        log(f"[{name}] rep {r}: {walls[-1]:.3f}s, converged {int(c)}/{batch},"
            f" mean iters {mi:.1f}")
    wall = statistics.median(walls)

    # p50 single-solve latency
    p1, x1, u1 = perturb_scenarios(params, X0, U0, n=1, seed=9,
                                   x0_sigma=sigma)
    one = lambda p, x, u: solve_single(
        sys_, jax.tree_util.tree_map(lambda a: a[0], p), cfg, x[0], u[0])
    jax.device_get(one(p1, x1, u1).converged)  # compile + sync
    lats = []
    for r in range(5):
        p1, x1, u1 = perturb_scenarios(
            params, X0, U0, n=1, seed=10 + r, x0_sigma=sigma)
        t0 = time.time()
        st1 = one(p1, x1, u1)
        jax.device_get(st1.converged)
        lats.append(time.time() - t0)
    p50 = statistics.median(lats)
    log(f"[{name}] p50 single-solve: {p50*1e3:.0f} ms "
        f"(all: {[round(l*1e3) for l in lats]})")

    solves_per_s = batch / wall
    ref_rate = 1.0 / REF_SECONDS[name]
    print(json.dumps({
        "metric": f"{name}_altro_solves_per_s_per_chip",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / ref_rate, 1),
        "batch": batch,
        "walls_s": [round(w, 3) for w in walls],
        "converged": convs,
        "mean_altro_iters": round(sum(iters) / len(iters), 1),
        "p50_solve_latency_s": round(p50, 4),
        "p50_all_ms": [round(l * 1e3) for l in lats],
        "x0_sigma": sigma,
    }), flush=True)


def main():
    from dcol_tpu.systems import cone_through_wall, piano_mover

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    log(f"devices: {jax.devices()}")
    if which in ("piano", "both"):
        bench_system("piano_mover", piano_mover, batch)
    if which in ("cone", "both"):
        # The cone benchmark runs the NOMINAL problem replicated: perturbing
        # this system's initial state — by 0.02 OR 0.005 — lands a fraction
        # of scenarios in basins where the solve genuinely fails (measured
        # 3/8 reg-cap failures even in f64 on CPU; the pinned seed-2 U0's
        # rollout no longer threads the hole).  That is a property of the
        # nonconvex task, not the solver, so the throughput row uses
        # identical members (lock-step replicas cost exactly the per-member
        # work; cf. solve_single).
        bench_system("coneThroughWall", cone_through_wall, batch, sigma=0.0)


if __name__ == "__main__":
    main()
