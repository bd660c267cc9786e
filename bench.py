"""Benchmark: batched cluttered-hallway quadrotor ALTRO solves on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "solves/s", "vs_baseline": N}

Baseline: the reference (pure Python/NumPy) solves this exact problem
(N=100, 11 obstacles, identical tolerances) once in 2886.5 s on CPU
(BASELINE.md; /root/reference/quadrotor.prof).  vs_baseline is the ratio of
our per-chip solve rate to the reference's 1/2886.5 solves/s.

Extra diagnostic lines go to stderr; stdout carries only the JSON line.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

REF_QUADROTOR_SECONDS = 2886.5  # reference quadrotor.prof total (BASELINE.md)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from dcol_tpu.parallel.batch import perturb_scenarios, solve_batch
    from dcol_tpu.systems import quadrotor

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    log(f"devices: {jax.devices()}  batch={batch}")

    sys_, params, X0, U0, cfg = quadrotor.make_problem(dtype=jnp.float32)
    params_b, X0_b, U0_b = perturb_scenarios(
        params, X0, U0, n=batch, seed=0, x0_sigma=0.02)

    t0 = time.time()
    st = solve_batch(sys_, params_b, cfg, X0_b, U0_b)
    st.X.block_until_ready()
    log(f"compile+first solve: {time.time() - t0:.1f}s")
    n_conv = int(jnp.sum(st.converged))
    log(f"converged {n_conv}/{batch}, mean iters {float(jnp.mean(st.iter)):.1f}")

    # timed runs (vary the seed so no caching shortcut is possible)
    reps = 3
    t0 = time.time()
    for r in range(reps):
        params_b, X0_b, U0_b = perturb_scenarios(
            params, X0, U0, n=batch, seed=r + 1, x0_sigma=0.02)
        st = solve_batch(sys_, params_b, cfg, X0_b, U0_b)
        st.X.block_until_ready()
        log(f"rep {r}: {time.time() - t0:.1f}s cumulative, "
            f"converged {int(jnp.sum(st.converged))}/{batch}, "
            f"mean iters {float(jnp.mean(st.iter)):.1f}")
    wall = (time.time() - t0) / reps
    solves_per_s = batch / wall
    log(f"wall per batch: {wall:.2f}s -> {solves_per_s:.2f} solves/s")

    baseline_rate = 1.0 / REF_QUADROTOR_SECONDS
    print(json.dumps({
        "metric": "quadrotor_altro_solves_per_s_per_chip",
        "value": round(solves_per_s, 4),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / baseline_rate, 1),
    }))


if __name__ == "__main__":
    main()
