"""Quick batch-64 throughput sweep over solver knobs on the real chip.

Each config is a fresh jit (one compile each); walls are median-of-3 timed
reps after an untimed warm rep, one fused device fetch per rep.

Usage: python tools/sweep_perf.py [C:margin[:polish[:block[:batch]]] ...]
       e.g. python tools/sweep_perf.py 4:1e-3 4:1e-3:1e-4 4:1e-3:1e-4:2048
"""

import dataclasses
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def measure(C, margin, polish=None, block=None, batch=64, phi=None,
            unroll=None, reps=3):
    from dcol_tpu.parallel.batch import perturb_scenarios, solve_batch
    from dcol_tpu.systems import quadrotor

    sys_, params, X0, U0, cfg = quadrotor.make_problem(dtype=jnp.float32)
    opts = sys_.scene.opts
    opts = dataclasses.replace(
        opts, warm_margin=margin,
        polish_margin=opts.polish_margin if polish is None else polish,
        block=opts.block if block is None else block)
    sys_ = dataclasses.replace(
        sys_, scene=dataclasses.replace(sys_.scene, opts=opts))
    cfg = dataclasses.replace(
        cfg, ls_parallel=C, phi=cfg.phi if phi is None else phi,
        scan_unroll=cfg.scan_unroll if unroll is None else unroll)

    def fetch(st):
        return jax.device_get(jnp.stack(
            [jnp.sum(st.converged).astype(jnp.float32),
             jnp.mean(st.iter.astype(jnp.float32))]))

    inputs = [perturb_scenarios(params, X0, U0, n=batch, seed=r + 1,
                                x0_sigma=0.02) for r in range(reps + 1)]
    tag = (f"C={C} margin={margin} polish={polish} block={block} "
           f"batch={batch} phi={phi} unroll={unroll}")
    t0 = time.time()
    pb, xb, ub = inputs[0]
    c0, mi0 = fetch(solve_batch(sys_, pb, cfg, xb, ub))
    print(f"{tag}: compile+warm {time.time()-t0:.0f}s, "
          f"conv {int(c0)}/{batch}, mean iters {mi0:.1f}",
          file=sys.stderr, flush=True)
    walls = []
    for r in range(reps):
        pb, xb, ub = inputs[r + 1]
        t0 = time.time()
        c, mi = fetch(solve_batch(sys_, pb, cfg, xb, ub))
        walls.append(time.time() - t0)
    wall = statistics.median(walls)
    print(f"{tag}: {batch/wall:.1f} solves/s "
          f"(walls {[round(w, 2) for w in walls]}, conv {int(c)}, "
          f"iters {mi:.1f})", flush=True)
    return batch / wall


def main():
    specs = sys.argv[1:] or ["4:1e-3", "4:1e-4", "8:1e-4"]
    out = {}
    for s in specs:
        parts = s.split(":")
        C, m = int(parts[0]), float(parts[1])
        polish = float(parts[2]) if len(parts) > 2 and parts[2] else None
        block = int(parts[3]) if len(parts) > 3 and parts[3] else None
        batch = int(parts[4]) if len(parts) > 4 and parts[4] else 64
        phi = float(parts[5]) if len(parts) > 5 and parts[5] else None
        unroll = int(parts[6]) if len(parts) > 6 else None
        out[s] = measure(C, m, polish=polish, block=block, batch=batch,
                         phi=phi, unroll=unroll)
    print({k: round(v, 1) for k, v in out.items()}, flush=True)


if __name__ == "__main__":
    main()
