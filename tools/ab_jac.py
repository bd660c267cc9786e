"""Steady-state batched-solve timer (real TPU): median of 3 timed reps.

``python tools/ab_jac.py [batch]`` — compile + warm rep, then 3 timed
batch-64 quadrotor solves with fresh perturbed scenarios, one fused metric
fetch each (a device_get is a full relay RTT — CLAUDE.md).

History: this file started as the A/B harness for hand-rolled RK4-chain
dynamics Jacobians vs ``jax.jacfwd``.  Verdict (A-B-A, 2026-08-20, one
process per mode): analytic 3.62 s/batch, jacfwd 0.96 s/batch — the
closed-form chain's ~12 batched (12,12) matmuls per knot lower to
MXU-padded dots at ~1% utilisation, while jacfwd keeps the derivative
in VPU-friendly elementwise tangent ops.  The analytic path was deleted;
do not revisit (CLAUDE.md 'Performance state').
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64

from dcol_tpu.parallel.batch import perturb_scenarios, solve_batch
from dcol_tpu.systems import quadrotor

sys_, params, X0, U0, cfg = quadrotor.make_problem(dtype=jnp.float32)
print(f"batch={batch} devices={jax.devices()}", file=sys.stderr)


def fetch(st):
    return jax.device_get(jnp.stack(
        [jnp.sum(st.converged).astype(jnp.float32),
         jnp.mean(st.iter.astype(jnp.float32))]))


inputs = [perturb_scenarios(params, X0, U0, n=batch, seed=r + 1,
                            x0_sigma=0.02) for r in range(4)]
t0 = time.time()
pb, xb, ub = inputs[0]
c, mi = fetch(solve_batch(sys_, pb, cfg, xb, ub))
print(f"compile+warm: {time.time() - t0:.1f}s  conv {int(c)}/{batch} "
      f"iters {mi:.1f}", file=sys.stderr)

walls = []
for r in range(3):
    pb, xb, ub = inputs[r + 1]
    t0 = time.time()
    c, mi = fetch(solve_batch(sys_, pb, cfg, xb, ub))
    walls.append(time.time() - t0)
    print(f"rep {r}: {walls[-1]:.2f}s conv {int(c)}/{batch} iters {mi:.1f}",
          file=sys.stderr)

med = statistics.median(walls)
print(f"median {med:.2f}s/batch -> {batch / med:.1f} solves/s "
      f"(all {[round(w, 2) for w in walls]})")
