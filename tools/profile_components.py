"""Component timing breakdown of one ALTRO iteration at batch scale.

Times each stage of the solver separately on the current device so
optimization effort goes where the wall-clock is.

Usage: python tools/profile_components.py [n_scenarios]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
        else a, out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
        else a, out)
    dt = (time.time() - t0) / reps
    print(f"{name:35s}: {dt*1e3:9.2f} ms")
    return out, dt


def main():
    from dcol_tpu.parallel.batch import perturb_scenarios
    from dcol_tpu.solver import altro
    from dcol_tpu.systems import quadrotor

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    sys_, params, X0, U0, cfg = quadrotor.make_problem(dtype=jnp.float32)
    params_b, X0_b, U0_b = perturb_scenarios(params, X0, U0, n=n,
                                             x0_sigma=0.02)
    print(f"batch {n} on {jax.devices()[0].platform}")

    mk = jax.jit(jax.vmap(
        lambda p, a, b: altro.make_initial_state(sys_, p, cfg, a, b)))
    st, _ = timeit("make_initial_state (rollout+eval)", mk,
                   params_b, X0_b, U0_b)

    step = jax.jit(jax.vmap(
        lambda p, s: altro.altro_iteration(sys_, p, cfg, s)))
    st2, t_iter = timeit("altro_iteration (full)", step, params_b, st)

    bwd = jax.jit(jax.vmap(lambda p, s: altro.backward_pass(
        sys_, p, s.X, s.U, s.mu, s.mux, s.lambd, s.rho, s.reg, warm=s.warm)))
    timeit("  backward_pass (jac+vg+riccati)", bwd, params_b, st2)

    jac = jax.jit(jax.vmap(lambda p, s: jax.vmap(
        lambda x, u, k: sys_.dynamics_jacobians(p, x, u, k))(
            s.X[:-1], s.U, jnp.arange(sys_.N - 1))))
    timeit("    dynamics jacobians", jac, params_b, st2)

    vg = jax.jit(jax.vmap(lambda p, s: sys_.constraints_x_vg_traj(
        p, s.X, warm=s.warm)))
    timeit("    constraints value+grad (PDIP)", vg, params_b, st2)

    val = jax.jit(jax.vmap(lambda p, s: sys_.constraints_x_traj(
        p, s.X, warm=s.warm)))
    timeit("    constraints value only (PDIP)", val, params_b, st2)

    asm = jax.jit(jax.vmap(lambda p, s: jax.vmap(
        lambda x: sys_.scene.assemble(*sys_.robot_pose(x), p["obs_r"],
                                      p["obs_p"]))(s.X)))
    timeit("    assembly only", asm, params_b, st2)

    ro = jax.jit(jax.vmap(lambda p, s: altro.initial_rollout(
        sys_, p, s.X[0], s.U)))
    timeit("  rollout (scan)", ro, params_b, st2)

    print(f"\nest. solves/s at ~47 iters: {n / (47 * t_iter):.1f}")


if __name__ == "__main__":
    main()
