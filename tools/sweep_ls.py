"""Line-search chunk-width (ls_parallel) sweep on the real TPU.

``python tools/sweep_ls.py [C ...]`` times steady-state batch-64 quadrotor
solves for each chunk width in one process (each C is its own compile; the
solve programs are independent, so same-process comparison is fair and
controls relay drift).  Round-2 (ungrouped kernels): C=1 41.0 / C=2 53.0 /
C=4 45.9 solves/s.  Grouped kernels halved the constraint-batch cost, which
shifts the optimum — re-measured here.
"""

import dataclasses
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

Cs = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
batch = 64

from dcol_tpu.parallel.batch import perturb_scenarios, solve_batch
from dcol_tpu.systems import quadrotor

sys_, params, X0, U0, cfg0 = quadrotor.make_problem(dtype=jnp.float32)
print(f"batch={batch} devices={jax.devices()}", file=sys.stderr)


def fetch(st):
    return jax.device_get(jnp.stack(
        [jnp.sum(st.converged).astype(jnp.float32),
         jnp.mean(st.iter.astype(jnp.float32))]))


inputs = [perturb_scenarios(params, X0, U0, n=batch, seed=r + 1,
                            x0_sigma=0.02) for r in range(4)]

for C in Cs:
    cfg = dataclasses.replace(cfg0, ls_parallel=C)
    t0 = time.time()
    pb, xb, ub = inputs[0]
    c, mi = fetch(solve_batch(sys_, pb, cfg, xb, ub))
    print(f"C={C}: compile+warm {time.time() - t0:.1f}s conv {int(c)} "
          f"iters {mi:.1f}", file=sys.stderr)
    walls = []
    for r in range(3):
        pb, xb, ub = inputs[r + 1]
        t0 = time.time()
        c, mi = fetch(solve_batch(sys_, pb, cfg, xb, ub))
        walls.append(time.time() - t0)
    med = statistics.median(walls)
    print(f"C={C}: median {med:.2f}s/batch -> {batch / med:.1f} solves/s "
          f"(all {[round(w, 2) for w in walls]}, conv {int(c)}, "
          f"iters {mi:.1f})")
