"""Receding-horizon MPC on top of the ALTRO solver.

Not present in the reference (single offline solves only); this is the
"multi-host MPC" building block from BASELINE.json: per control tick,
re-solve the horizon from the measured state, apply the first control,
advance the plant.  Warm starts carry the FULL augmented-Lagrangian state
across ticks — the shifted control sequence U, the shifted inequality duals
(mu, mux), the goal duals (lambd), and the penalty rho — so each tick resumes
near the previous tick's optimum and converges in a handful of iterations
(measured ~2-4x fewer than dual-cold ticks; see
tests/test_parallel.py::test_mpc_dual_warm_start_cuts_iterations).

A true receding horizon is supported via ``xref_path``: a (n_steps + N, nx)
reference path from which each tick's Xref window is sliced.  Without it the
controller regulates to the fixed ``params["Xref"]`` (terminal-goal
regulation, the reference systems' setup).

The whole closed loop is one ``lax.scan`` (vmappable over scenarios,
shardable over a mesh).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from dcol_tpu.solver import altro


class MpcResult(NamedTuple):
    X_applied: jnp.ndarray   # (n_steps + 1, nx) closed-loop state trajectory
    U_applied: jnp.ndarray   # (n_steps, nu) applied controls
    iters: jnp.ndarray       # (n_steps,) ALTRO iterations per tick
    converged: jnp.ndarray   # (n_steps,) per-tick convergence flag
    cost: jnp.ndarray        # (n_steps,) per-tick solve cost


def _shift(a):
    """Drop the leading row, repeat the last (warm-start shift along the
    horizon)."""
    return jnp.concatenate([a[1:], a[-1:]], axis=0)


@partial(jax.jit, static_argnames=("sys", "cfg", "n_steps", "carry_duals"))
def mpc_run(sys, params, cfg: altro.AltroConfig, x0, U_init,
            n_steps: int, noise: Optional[jnp.ndarray] = None,
            xref_path: Optional[jnp.ndarray] = None,
            carry_duals: bool = True) -> MpcResult:
    """Run ``n_steps`` closed-loop ticks.

    noise: optional (n_steps, nx) additive state disturbance applied after
    each plant step (simulating model mismatch).
    xref_path: optional (n_steps + N, nx) reference path; tick k tracks the
    window ``xref_path[k : k + N]`` (true receding horizon).
    carry_duals: warm-start each tick's AL duals/penalty from the previous
    tick (False = U-only warm start, duals restart at zero)."""
    dt = U_init.dtype
    nx, N = sys.nx, sys.N

    mu0 = jnp.zeros((N - 1, sys.ncu), dt)
    mux0 = jnp.zeros((N, sys.ncx), dt)
    lambd0 = jnp.zeros((nx,), dt)
    rho0 = jnp.asarray(cfg.rho0, dt)

    def tick(carry, inp):
        x, U_warm, mu, mux, lambd, rho = carry
        k, w = inp
        X0 = jnp.tile(x[None], (N, 1))
        p = dict(params)
        if xref_path is not None:
            p["Xref"] = jax.lax.dynamic_slice(
                jnp.asarray(xref_path, dt), (k, 0), (N, nx))
        st = altro.solve(sys, p, cfg, X0, U_warm,
                         duals=(mu, mux, lambd) if carry_duals else None,
                         rho=rho if carry_duals else None)
        u0 = st.U[0]
        x_next = sys.discrete_dynamics(p, x, u0, k) + w
        # shift the warm start along the horizon: drop the applied knot,
        # repeat the last
        U_next = _shift(st.U)
        mu_n = _shift(st.mu) if carry_duals else mu0
        mux_n = _shift(st.mux) if carry_duals else mux0
        lambd_n = st.lambd if carry_duals else lambd0
        rho_n = st.rho if carry_duals else rho0
        out = (x_next, u0, st.iter, st.converged, st.J)
        return (x_next, U_next, mu_n, mux_n, lambd_n, rho_n), out

    w = noise if noise is not None else jnp.zeros((n_steps, nx), dt)
    carry0 = (jnp.asarray(x0, dt), jnp.asarray(U_init, dt),
              mu0, mux0, lambd0, rho0)
    _, (Xs, Us, iters, conv, costs) = jax.lax.scan(
        tick, carry0, (jnp.arange(n_steps), w))
    X_applied = jnp.concatenate([jnp.asarray(x0, dt)[None], Xs], axis=0)
    return MpcResult(X_applied, Us, iters, conv, costs)
