"""Where does the real solve's per-iteration time go?

profile_breakdown.py times one isolated altro_iteration from a 10-iteration
state (~15 ms at batch 64), yet bench.py's full while_loop solve costs
~30 ms/iteration — this probe localises the gap by timing fixed 10-iteration
fori_loop windows at different phases of the solve (per-iteration cost grows
with the AL penalty as PDIP problems harden and line searches deepen), plus
a pallas block-size sweep on the constraint batch.

Usage: python benchmarks/probe_iter_cost.py [batch]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf)


def main():
    from dcol_tpu.parallel.batch import perturb_scenarios
    from dcol_tpu.solver import altro
    from dcol_tpu.systems import quadrotor

    batch = int(_sys.argv[1]) if len(_sys.argv) > 1 else 64
    sys_, params, X0, U0, cfg = quadrotor.make_problem(dtype=jnp.float32)
    params_b, X0_b, U0_b = perturb_scenarios(
        params, X0, U0, n=batch, seed=0, x0_sigma=0.02)

    @jax.jit
    def init(params_b, X0_b, U0_b):
        return jax.vmap(lambda p, x0, u0: altro.make_initial_state(
            sys_, p, cfg, x0, u0))(params_b, X0_b, U0_b)

    @jax.jit
    def advance10(st, params_b):
        def one(p, s):
            def body(i, s_):
                active = ~(s_.converged | s_.failed)
                new = altro.altro_iteration(sys_, p, cfg, s_, active=active)
                return altro._where(active, new, s_)
            return jax.lax.fori_loop(0, 10, body, s)
        return jax.vmap(one)(params_b, st)

    st = init(params_b, X0_b, U0_b)
    sync(st.X)
    # warm the compile
    st_w = advance10(st, params_b)
    sync(st_w.X)

    print(f"batch={batch}: per-iteration wall by solve phase "
          "(10-iteration windows):")
    for win in range(6):
        t0 = time.time()
        st2 = advance10(st, params_b)
        sync(st2.X)
        dtms = (time.time() - t0) / 10 * 1e3
        print(f"  iters {win*10:2d}-{win*10+10:2d}: {dtms:6.2f} ms/iter  "
              f"conv {int(jax.device_get(jnp.sum(st2.converged)))}/{batch} "
              f"mean_alpha {float(jax.device_get(jnp.mean(st2.alpha))):.3f}",
              flush=True)
        st = st2

    # pallas block-size sweep on the warm constraint batch
    from dcol_tpu.ops.pdip_pallas import solve_socp_pallas

    scene = sys_.scene
    Xf = st.X.reshape(batch * sys_.N, sys_.nx)
    rs, ps = jax.jit(jax.vmap(sys_.robot_pose))(Xf)
    obs_r, obs_p = params["obs_r"], params["obs_p"]

    @jax.jit
    def assemble(rs, ps):
        c, G, h = jax.vmap(
            lambda r, p: scene.assemble(r, p, obs_r, obs_p))(rs, ps)
        f = lambda a: a.reshape((-1,) + a.shape[2:])
        return f(c), f(G), f(h)

    c_, G_, h_ = assemble(rs, ps)
    sync(c_)
    print(f"pdip kernel block sweep, B={c_.shape[0]} cold problems:")
    for block in (128, 256, 512, 1024):
        pd = jax.jit(lambda c, G, h, block=block: solve_socp_pallas(
            c, G, h, scene.cone_layout, tol=scene.opts.tol,
            max_iters=scene.opts.max_iters, jitter=scene.opts.jitter,
            block=block))
        out = pd(c_, G_, h_)
        sync(out.iters)
        t0 = time.time()
        reps = 10
        for _ in range(reps):
            out = pd(c_, G_, h_)
        sync(out.iters)
        wall = (time.time() - t0) / reps * 1e3
        print(f"  block {block:4d}: {wall:7.2f} ms  "
              f"({c_.shape[0]/wall*1e3:,.0f} cold solves/s)", flush=True)


if __name__ == "__main__":
    main()
