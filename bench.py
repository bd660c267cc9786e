"""Benchmark: batched cluttered-hallway quadrotor ALTRO solves on one chip.

Prints ONE JSON line covering all three BASELINE.json metrics:
  {"metric": "quadrotor_altro_solves_per_s_per_chip", "value": N,
   "unit": "solves/s", "vs_baseline": N,
   "p50_solve_latency_s": N, "pdip_iters_per_s": N, ...}

Baseline: the reference (pure Python/NumPy) solves this exact problem
(N=100, 11 obstacles, identical tolerances) once in 2886.5 s on CPU
(BASELINE.md; /root/reference/quadrotor.prof).  vs_baseline is the ratio of
our per-chip solve rate to the reference's 1/2886.5 solves/s.  The reference's
PDIP rate is 377,311 solves x ~9.8 iters / 2653.5 s = ~1393 PDIP iters/s.

Timing note: ``block_until_ready()`` is a NO-OP over the axon TPU relay —
every timed region here ends with a real device fetch (``jax.device_get``)
before the clock is read.

Extra diagnostic lines go to stderr; stdout carries only the JSON line.
"""

import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp

REF_QUADROTOR_SECONDS = 2886.5  # reference quadrotor.prof total (BASELINE.md)
REF_PDIP_ITERS_PER_S = 377311 * 9.8 / 2653.5  # quadrotor.prof, BASELINE.md


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from dcol_tpu.parallel.batch import perturb_scenarios, solve_batch
    from dcol_tpu.systems import quadrotor

    # 128 is the measured throughput plateau (docs/SCALING.md §1 round-5
    # curve: 64 -> 198, 128 -> 242, flat to 250 at 1024); 64 sat ~20% below
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    log(f"devices: {jax.devices()}  batch={batch}")

    sys_, params, X0, U0, cfg = quadrotor.make_problem(dtype=jnp.float32)
    params_b, X0_b, U0_b = perturb_scenarios(
        params, X0, U0, n=batch, seed=0, x0_sigma=0.02)

    t0 = time.time()
    st = solve_batch(sys_, params_b, cfg, X0_b, U0_b)
    n_conv = int(jax.device_get(jnp.sum(st.converged)))  # real device sync
    log(f"compile+first solve: {time.time() - t0:.1f}s")
    log(f"converged {n_conv}/{batch}, "
        f"mean iters {float(jax.device_get(jnp.mean(st.iter))):.1f}")

    # --- throughput: timed batched runs (seed varies: no caching shortcut) --
    # Inputs are pre-generated (perturbation is host-side data prep, not chip
    # work), one UNTIMED warm rep exercises the exact rep code path first
    # (the fused metrics fetch below is a fresh eager expression whose relay
    # compile otherwise lands in rep 0 — it cost ~11 s in BENCH_r02), and the
    # reported wall is the per-rep MEDIAN, robust to intermittent relay
    # stalls (CLAUDE.md).
    reps = 5

    def fetch_stats(st):
        # one fused fetch per rep (each device_get is a full relay RTT)
        return jax.device_get(jnp.stack(
            [jnp.sum(st.converged).astype(jnp.float32),
             jnp.mean(st.iter.astype(jnp.float32))]))

    inputs = [perturb_scenarios(params, X0, U0, n=batch, seed=r + 1,
                                x0_sigma=0.02) for r in range(reps + 1)]
    pb, xb, ub = inputs[0]
    fetch_stats(solve_batch(sys_, pb, cfg, xb, ub))
    walls, mean_iters = [], []
    for r in range(reps):
        pb, xb, ub = inputs[r + 1]
        t0 = time.time()
        st = solve_batch(sys_, pb, cfg, xb, ub)
        c, mi = fetch_stats(st)
        walls.append(time.time() - t0)
        mean_iters.append(float(mi))
        log(f"rep {r}: {walls[-1]:.2f}s, "
            f"converged {int(c)}/{batch}, mean iters {mi:.1f}")
    wall = statistics.median(walls)
    solves_per_s = batch / wall
    log(f"wall per batch: median {wall:.2f}s "
        f"(all: {[round(w, 2) for w in walls]}) -> "
        f"{solves_per_s:.2f} solves/s")

    # --- p50 single-solve latency (median of 5) ----------------------------
    # solve_single replicates the problem to batch 8: measured ~2x faster
    # end-to-end than a true batch-1 solve (XLA picks degenerate scan
    # layouts for size-1 batches; see solve_single docstring).
    from dcol_tpu.parallel.batch import solve_single

    p1, x1, u1 = perturb_scenarios(params, X0, U0, n=1, seed=9, x0_sigma=0.02)
    one = lambda p, x, u: solve_single(
        sys_, jax.tree_util.tree_map(lambda a: a[0], p), cfg, x[0], u[0])
    jax.device_get(one(p1, x1, u1).converged)  # compile + sync
    lats = []
    for r in range(5):
        p1, x1, u1 = perturb_scenarios(
            params, X0, U0, n=1, seed=10 + r, x0_sigma=0.02)
        t0 = time.time()
        st1 = one(p1, x1, u1)
        jax.device_get(st1.converged)
        lats.append(time.time() - t0)
    p50 = statistics.median(lats)
    log(f"single-solve latency: p50 {p50*1e3:.0f} ms "
        f"(all: {[round(l*1e3) for l in lats]} ms; replicated-batch-8 mode)")

    # --- PDIP iters/s: the hot kernels alone at the solver's working batch --
    # (batch scenarios) x (N knots) x (11 obstacles) pair problems grouped by
    # obstacle kind (exact layouts, zero padding rows), cold-started — the
    # same set of kernel launches ALTRO issues every iteration.
    from dcol_tpu.ops.cones import ConeLayout
    from dcol_tpu.ops.pdip_pallas import solve_socp_pallas

    scene = sys_.scene
    rs, ps = jax.vmap(sys_.robot_pose)(params["Xref"])
    grouped = jax.jit(lambda rs, ps: jax.vmap(
        lambda r, p: scene.assemble_groups(r, p, params["obs_r"],
                                           params["obs_p"])
    )(rs, ps))(rs, ps)
    mult = max(1, batch)       # the kernel batch ALTRO launches per iteration
    flats = []                 # per-group (c, G, h, ConeLayout)
    B = 0
    for gi, (lay, idx) in enumerate(scene.groups):
        c_, G_, h_ = grouped[gi]
        B0 = c_.shape[0] * c_.shape[1]
        cf = jnp.tile(c_.reshape(B0, -1), (mult, 1))
        Gf = jnp.tile(G_.reshape(B0, *G_.shape[2:]), (mult, 1, 1))
        hf = jnp.tile(h_.reshape(B0, -1), (mult, 1))
        flats.append((cf, Gf, hf, ConeLayout(lay.n_ort, lay.s1, lay.s2)))
        B += B0 * mult

    def solve_all(chs):
        outs = []
        for (c, G, h), (_, _, _, cl) in zip(chs, flats):
            outs.append(solve_socp_pallas(
                c, G, h, cl, tol=scene.opts.tol,
                max_iters=scene.opts.max_iters, jitter=scene.opts.jitter))
        return outs

    chs0 = [(c, G, h) for c, G, h, _ in flats]
    outs = jax.jit(solve_all)(chs0)
    total_it = float(jax.device_get(sum(jnp.sum(o.iters) for o in outs)))

    # Per-call relay dispatch costs 20-40 ms with high variance, swamping the
    # kernels themselves; chain K applications inside ONE jitted fori_loop
    # (a runtime-zero data dependency keeps the loop body from being hoisted:
    # min(iters, 0) == 0 at runtime but is not provably so).
    K = 10

    @jax.jit
    def chained(chs):
        def body(i, carry):
            chs_i, acc = carry
            outs = solve_all(chs_i)
            chs_n = []
            for (c, G, h), o in zip(chs_i, outs):
                dep = jnp.minimum(o.iters, 0).astype(h.dtype)
                chs_n.append((c, G, h + dep[:, None]))
                acc = acc + jnp.sum(o.iters)
            return chs_n, acc
        _, tot = jax.lax.fori_loop(0, K, body,
                                   (chs, jnp.zeros((), jnp.float32)))
        return tot

    tot = chained(chs0)                 # compile + warm
    jax.device_get(tot)
    t0 = time.time()
    tot = chained(chs0)
    jax.device_get(tot)
    pd_wall = (time.time() - t0) / K
    pdip_iters_per_s = total_it / pd_wall
    log(f"pdip kernels ({len(flats)} groups): {B} pair problems, "
        f"{total_it:.0f} iters in {pd_wall*1e3:.1f} ms -> "
        f"{pdip_iters_per_s:.3g} iters/s, {B/pd_wall:.3g} cold solves/s")

    baseline_rate = 1.0 / REF_QUADROTOR_SECONDS
    print(json.dumps({
        "metric": "quadrotor_altro_solves_per_s_per_chip",
        "value": round(solves_per_s, 4),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / baseline_rate, 1),
        "batch": batch,
        "mean_altro_iters": round(sum(mean_iters) / len(mean_iters), 1),
        "p50_solve_latency_s": round(p50, 4),
        "pdip_iters_per_s": round(pdip_iters_per_s, 0),
        "pdip_iters_per_s_vs_baseline": round(
            pdip_iters_per_s / REF_PDIP_ITERS_PER_S, 1),
    }))


if __name__ == "__main__":
    main()
