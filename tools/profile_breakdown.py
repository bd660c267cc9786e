"""Component-time breakdown of one batched ALTRO iteration on TPU.

Times each jitted piece of altro_iteration separately at the bench
configuration (quadrotor, batch 64, f32, pallas backend) so optimization
effort goes where the milliseconds are.  Pieces:

  - full altro_iteration (the whole per-iteration cost)
  - backward_pass (Riccati scan + constraint value/grad polish solve)
  - constraint PDIP batch alone, warm and cold (64*100*11 pairs)
  - envelope gradients alone (assembly jacfwd, no solve)
  - rollout alone (batched line-search candidate rollout)
  - dynamics jacobians alone

Each piece is jitted and timed IN ISOLATION, so the component times will not
sum to full_iteration: inside the full jit XLA fuses across components, and
the residual vs full_iteration reflects that fusion/overlap, not an
unprofiled stage.

Usage: python tools/profile_breakdown.py [--merge] [batch] [iters_per_solve]
       (--merge: latency mode, one merged padded kernel per constraint batch)
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Mean ALTRO iterations per converged quadrotor solve, measured by bench.py at
# batch 64 (f32, pallas).  Used only to extrapolate solves/s from the
# per-iteration time; override via argv[2] if the measured mean drifts.
MEAN_ITERS_PER_SOLVE = 47.5


def _sync(out):
    """Force a real device fetch: block_until_ready is a no-op over the
    axon TPU relay (CLAUDE.md), so fetch one scalar-ish leaf instead."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf)


# One real device fetch costs a full relay round trip (~tens of ms), which
# would swamp millisecond-scale components if paid per rep.  Dispatches are
# async, so: issue `reps` back-to-back calls, fetch ONCE, and subtract the
# separately measured dispatch+fetch floor (a trivial jitted op timed the
# same way).
_FLOOR_MS = None


def _measure_floor():
    global _FLOOR_MS
    import jax.numpy as jnp

    tiny = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    _sync(tiny(x))
    t0 = time.time()
    reps = 30
    for _ in range(reps):
        out = tiny(x)
    _sync(out)
    _FLOOR_MS = (time.time() - t0) / reps * 1e3
    print(f"dispatch+fetch floor: {_FLOOR_MS:.2f} ms/call "
          f"(subtracted from every component)", file=sys.stderr)


def timeit(fn, *args, reps=20, warmup=2):
    if _FLOOR_MS is None:
        _measure_floor()
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return max(0.0, (time.time() - t0) / reps * 1e3 - _FLOOR_MS)  # ms


def main():
    from dcol_tpu.parallel.batch import perturb_scenarios
    from dcol_tpu.solver import altro
    from dcol_tpu.systems import quadrotor

    argv = [a for a in sys.argv[1:] if a != "--merge"]
    merge = "--merge" in sys.argv[1:]
    batch = int(argv[0]) if len(argv) > 0 else 64
    sys_, params, X0, U0, cfg = quadrotor.make_problem(
        dtype=jnp.float32, merge_groups=merge)
    params_b, X0_b, U0_b = perturb_scenarios(
        params, X0, U0, n=batch, seed=0, x0_sigma=0.02)

    # a realistic mid-solve state: run 10 iterations first
    @jax.jit
    def advance(params_b, X0_b, U0_b):
        def one(p, x0, u0):
            st = altro.make_initial_state(sys_, p, cfg, x0, u0)
            def body(i, s):
                return altro.altro_iteration(sys_, p, cfg, s)
            return jax.lax.fori_loop(0, 10, body, st)
        return jax.vmap(one)(params_b, X0_b, U0_b)

    print("advancing 10 iterations to a realistic state...", file=sys.stderr)
    st = advance(params_b, X0_b, U0_b)
    jax.block_until_ready(st.X)

    results = {}

    # 1. full iteration
    @jax.jit
    def full_iter(st, params_b):
        return jax.vmap(lambda p, s: altro.altro_iteration(sys_, p, cfg, s)
                        )(params_b, st)
    results["full_iteration"] = timeit(full_iter, st, params_b)

    # 2. backward pass (explicitly the WITH-solve path, so the comparison to
    #    backward_pass_nosolve below is meaningful regardless of cfg defaults)
    @jax.jit
    def bwd(st, params_b):
        def one(p, s):
            return altro.backward_pass(
                sys_, p, s.X, s.U, s.mu, s.mux, s.lambd, s.rho, s.reg,
                warm=s.warm, grads_from_accepted=False)
        return jax.vmap(one)(params_b, st)
    results["backward_pass"] = timeit(bwd, st, params_b)

    K, k, dJ, kmax = bwd(st, params_b)

    # 3. forward pass
    @jax.jit
    def fwd(st, params_b, K, k):
        def one(p, s, K_, k_):
            return altro.forward_pass(
                sys_, p, cfg, s.X, s.U, K_, k_, s.mu, s.mux, s.lambd,
                s.rho, s.hx, s.hu, s.warm)
        return jax.vmap(one)(params_b, st, K, k)
    results["forward_pass"] = timeit(fwd, st, params_b, K, k)

    # 4. constraint batch solves (vg = value+grad path used by backward pass)
    @jax.jit
    def cons_warm(st, params_b):
        def one(p, s):
            return sys_.constraints_x_traj(p, s.X, warm=s.warm)[0]
        return jax.vmap(one)(params_b, st)
    results["constraints_solve_warm"] = timeit(cons_warm, st, params_b)

    @jax.jit
    def cons_cold(st, params_b):
        def one(p, s):
            return sys_.constraints_x_traj(p, s.X, warm=None)[0]
        return jax.vmap(one)(params_b, st)
    results["constraints_solve_cold"] = timeit(cons_cold, st, params_b)

    @jax.jit
    def cons_vg(st, params_b):
        def one(p, s):
            return sys_.constraints_x_vg_traj(p, s.X, warm=s.warm)[:2]
        return jax.vmap(one)(params_b, st)
    results["constraints_vg_warm"] = timeit(cons_vg, st, params_b)

    # 5. envelope gradients only (no solve)
    @jax.jit
    def env_grads(st, params_b):
        def one(p, s):
            return sys_.constraints_x_vg_from_solution(p, s.X, s.warm)
        return jax.vmap(one)(params_b, st)
    results["envelope_grads_only"] = timeit(env_grads, st, params_b)

    # 6. rollout (one alpha candidate)
    @jax.jit
    def roll(st, params_b, K, k):
        def one(p, s, K_, k_):
            return altro.rollout(sys_, p, s.X, s.U, K_, k_,
                                 jnp.float32(1.0))
        return jax.vmap(one)(params_b, st, K, k)
    results["rollout_1alpha"] = timeit(roll, st, params_b, K, k)

    # 7. dynamics jacobians
    @jax.jit
    def dynjac(st, params_b):
        def one(p, s):
            ks = jnp.arange(sys_.N - 1)
            return jax.vmap(
                lambda x, u, kk: sys_.dynamics_jacobians(p, x, u, kk)
            )(s.X[:-1], s.U, ks)
        return jax.vmap(one)(params_b, st)
    results["dynamics_jacobians"] = timeit(dynjac, st, params_b)

    # 8. riccati scan only (reuse precomputed expansions via backward_pass
    #    with grads_from_accepted=True -> no solve inside)
    @jax.jit
    def bwd_nosolve(st, params_b):
        def one(p, s):
            return altro.backward_pass(
                sys_, p, s.X, s.U, s.mu, s.mux, s.lambd, s.rho, s.reg,
                warm=s.warm, grads_from_accepted=True)
        return jax.vmap(one)(params_b, st)
    results["backward_pass_nosolve"] = timeit(bwd_nosolve, st, params_b)

    iters_per_solve = (float(argv[1]) if len(argv) > 1
                       else MEAN_ITERS_PER_SOLVE)
    print(f"\n== breakdown at batch={batch} (ms per call, components timed in"
          " isolation; they will not sum to full_iteration — see docstring) ==")
    for k_, v in results.items():
        print(f"  {k_:28s} {v:8.2f} ms")
    fi = results["full_iteration"]
    print(f"\n  full iteration {fi:.2f} ms -> "
          f"{batch / (fi / 1e3 * iters_per_solve):.1f} solves/s assuming "
          f"{iters_per_solve} mean iters/solve (bench.py-measured; argv[2])")


if __name__ == "__main__":
    main()
