"""Scenario-parallel batching: solve many perturbed trajectory-optimisation
problems at once with ``vmap`` (single host/chip) — the data-parallel analogue
axis for this workload (SURVEY.md §2.2).

The reference solves exactly one problem per process (``main.py:52``); here a
batch of initial states / obstacle layouts is one compiled solve, with
per-scenario convergence/failure flags (divergent members freeze, they never
raise)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dcol_tpu.solver import altro


def perturb_scenarios(params, X0, U0, *, n: int, seed: int = 0,
                      x0_sigma: float = 0.05, obs_sigma: float = 0.0):
    """Batch of scenarios: perturbed initial state (and optionally obstacle
    positions).  Returns (params_b, X0_b, U0_b) with leading dim n."""
    rng = np.random.default_rng(seed)
    dt = X0.dtype
    X0_b = jnp.tile(X0[None], (n, 1, 1))
    X0_b = X0_b.at[:, 0, :].add(
        jnp.asarray(rng.normal(0.0, x0_sigma, (n, X0.shape[1])), dt))
    U0_b = jnp.tile(U0[None], (n, 1, 1))
    params_b = jax.tree_util.tree_map(lambda a: jnp.tile(a[None], (n,) + (1,) * a.ndim),
                                      params)
    if obs_sigma:
        params_b["obs_r"] = params_b["obs_r"] + jnp.asarray(
            rng.normal(0.0, obs_sigma, params_b["obs_r"].shape), dt)
    # keep every scenario's initial state consistent with its rollout start
    return params_b, X0_b, U0_b


@partial(jax.jit, static_argnames=("sys", "cfg"))
def solve_batch(sys, params_b, cfg: altro.AltroConfig, X0_b, U0_b):
    """vmapped full solves; one XLA computation for the whole batch."""
    return jax.vmap(lambda p, x0, u0: altro.solve(sys, p, cfg, x0, u0))(
        params_b, X0_b, U0_b)


@partial(jax.jit, static_argnames=("sys", "cfg", "replicas"))
def solve_single(sys, params, cfg: altro.AltroConfig, X0, U0,
                 *, replicas: int = 8):
    """Latency-optimal SINGLE solve: replicate the problem ``replicas``
    times, solve the batch, return member 0.

    Counter-intuitive but measured (quadrotor N=100, one v5e chip): a true
    batch-1 solve runs ~2x SLOWER end-to-end than the same solve replicated
    to batch 8 (p50 ~0.41 s vs ~0.21 s).  With a size-1 batch XLA picks
    degenerate layouts for the time-sequential scans — the line-search
    rollout alone costs 3.8 ms/iteration at batch 1 vs ~0.1 ms at batch 8
    (tools/probe_latency.py, rollout batch sweep) — while at batch >= 8 every
    per-step op is a full (8, 128) register tile anyway, so the replicas are
    free.  Identical replicas stay in lock-step: the batch converges in
    exactly the single problem's iteration count."""
    tile = lambda a: jnp.tile(a[None], (replicas,) + (1,) * a.ndim)
    params_b = jax.tree_util.tree_map(tile, params)
    st = solve_batch(sys, params_b, cfg, tile(jnp.asarray(X0)),
                     tile(jnp.asarray(U0)))
    return jax.tree_util.tree_map(lambda a: a[0], st)


@partial(jax.jit, static_argnames=("sys", "cfg", "block"))
def solve_batch_blocked(sys, params_b, cfg: altro.AltroConfig, X0_b, U0_b,
                        *, block: int = 128):
    """Block-sequential batched solves: ``lax.map`` over blocks of ``block``
    scenarios, each block a vmapped :func:`altro.solve`.

    Why not one big vmap: under ``vmap`` the outer AL ``while_loop`` runs in
    LOCK-STEP, so the whole batch pays the slowest member's iteration count
    (and, within each iteration, the deepest line-search backtracker's chunk
    count — the active mask only cheapens, not eliminates, converged
    members).  The straggler tail grows with batch size while per-iteration
    throughput saturates at ~128 scenarios on one chip, which is exactly the
    measured scaling falloff (69 -> 54 solves/s from batch 128 to 1024,
    benchmarks/scaling_r03_raw.log, mean iters flat at 48).  Solving in
    sequential blocks bounds every straggler's blast radius to its own block
    and keeps each kernel launch at the throughput-optimal width.

    Per member this runs the same algorithm as :func:`solve_batch` — but NOT
    bitwise-identically: XLA optimises each batch shape separately, so
    reductions reassociate and a scenario sitting exactly on a line-search /
    convergence boundary can take a different iteration count (pinned by
    tests/test_parallel.py on well-conditioned scenarios; same caveat as any
    re-compile at a new batch size).  ``block`` must divide the batch.  One
    XLA computation; compile cost is that of a ``block``-wide solve, not the
    full batch."""
    n = X0_b.shape[0]
    if n % block:
        raise ValueError(f"batch {n} not divisible by block {block}")
    if n == block:
        return solve_batch(sys, params_b, cfg, X0_b, U0_b)
    nb = n // block
    to_blocks = lambda a: a.reshape((nb, block) + a.shape[1:])
    pb = jax.tree_util.tree_map(to_blocks, params_b)

    def one_block(args):
        p, x0, u0 = args
        return jax.vmap(lambda pp, xx, uu: altro.solve(sys, pp, cfg, xx, uu)
                        )(p, x0, u0)

    out = jax.lax.map(one_block, (pb, to_blocks(X0_b), to_blocks(U0_b)))
    return jax.tree_util.tree_map(
        lambda a: a.reshape((n,) + a.shape[2:]), out)
