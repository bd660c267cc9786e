"""Micro-benchmark: batched PDIP pair-proximity solves (both backends).

Usage: python benchmarks/bench_pdip.py [batch_multiplier]
Builds the quadrotor scene's (N x 11 obstacles) pair problems and times the
XLA and Pallas solvers, cold and warm.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax
import jax.numpy as jnp


def main():
    from dcol_tpu.ops.pdip import solve_socp
    from dcol_tpu.ops.pdip_pallas import solve_socp_pallas
    from dcol_tpu.systems import quadrotor

    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    sys_, params, X0, U0, cfg = quadrotor.make_problem(dtype=jnp.float32)
    scene = sys_.scene
    rs, ps = jax.vmap(sys_.robot_pose)(params["Xref"])
    c, G, h = jax.jit(lambda rs, ps: jax.vmap(
        lambda r, p: scene.assemble(r, p, params["obs_r"], params["obs_p"])
    )(rs, ps))(rs, ps)
    B = c.shape[0] * c.shape[1]
    cf = jnp.tile(c.reshape(B, -1), (mult, 1))
    Gf = jnp.tile(G.reshape(B, *G.shape[2:]), (mult, 1, 1))
    hf = jnp.tile(h.reshape(B, -1), (mult, 1))
    B *= mult
    lay = scene.cone_layout
    print(f"batch {Gf.shape} on {jax.devices()[0].platform}")

    interp = jax.devices()[0].platform == "cpu"
    runs = {
        "xla cold": lambda w: solve_socp(
            cf, Gf, hf, lay, tol=2e-5, max_iters=30, jitter=1e-6, warm=w),
        "pallas cold": lambda w: solve_socp_pallas(
            cf, Gf, hf, lay, tol=2e-5, max_iters=30, jitter=1e-6,
            interpret=interp, warm=w),
    }
    # block_until_ready() is a NO-OP over the axon TPU relay: every timed
    # region ends with a real device fetch before the clock is read.
    sols = {}
    for name, fn in runs.items():
        out = fn(None)
        jax.device_get(out.x[0])  # compile + sync
        t0 = time.time()
        for _ in range(10):
            out = fn(None)
            jax.device_get(out.x[0])
        dt = (time.time() - t0) / 10
        sols[name] = out
        print(f"{name:12s}: {dt*1e3:8.2f} ms  {B/dt:10.0f} solves/s  "
              f"conv {int(jnp.sum(out.converged))}/{B} "
              f"mean iters {float(jnp.mean(out.iters)):.1f}")

    # warm re-solve (same problems: the best case; ALTRO sees nearby ones)
    for name, fn in runs.items():
        prev = sols[name]
        warm = (prev.x, prev.s, prev.z)
        out = fn(warm)
        jax.device_get(out.x[0])
        t0 = time.time()
        for _ in range(10):
            out = fn(warm)
            jax.device_get(out.x[0])
        dt = (time.time() - t0) / 10
        print(f"{name.split()[0]+' warm':12s}: {dt*1e3:8.2f} ms  "
              f"{B/dt:10.0f} solves/s  mean iters "
              f"{float(jnp.mean(out.iters)):.1f}")


if __name__ == "__main__":
    main()
