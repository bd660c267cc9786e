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
