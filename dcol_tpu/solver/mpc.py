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


class MpcCarry(NamedTuple):
    """The closed loop's full resume state after a tick: checkpoint this
    (per scenario / per host shard) and pass it back as ``resume_from`` to
    continue a long MPC run across host restarts (checkpoint.py)."""
    x: jnp.ndarray       # (nx,) current plant state
    U: jnp.ndarray       # (N-1, nu) shifted warm-start controls
    mu: jnp.ndarray      # (N-1, ncu) shifted control duals
    mux: jnp.ndarray     # (N, ncx) shifted state duals
    lambd: jnp.ndarray   # (nx,) goal duals
    rho: jnp.ndarray     # AL penalty


class MpcResult(NamedTuple):
    X_applied: jnp.ndarray   # (n_steps + 1, nx) closed-loop state trajectory
    U_applied: jnp.ndarray   # (n_steps, nu) applied controls
    iters: jnp.ndarray       # (n_steps,) ALTRO iterations per tick
    converged: jnp.ndarray   # (n_steps,) per-tick convergence flag
    cost: jnp.ndarray        # (n_steps,) per-tick solve cost
    # quality evidence (iteration-capped anytime ticks are only useful if
    # the plans they emit are good — these certify it per tick):
    convio: jnp.ndarray      # (n_steps,) TRUE constraint violation of the
                             # tick's plan, the solver's convio formula
                             # (|h|+h doubling + goal gap) recomputed from
                             # the final trajectory — NOT AltroState.convio,
                             # which only updates when a dual update fires
                             # (never, at tight per-tick budgets)
    h_applied: jnp.ndarray   # (n_steps,) max_obstacles (1 - alpha) at the
                             # tick's MEASURED state (st.hx[0]; X[0] == x):
                             # > 0 means the closed loop is in collision
    kmax: jnp.ndarray        # (n_steps,) final feedforward-gain norm
                             # (inner-loop optimality proxy, atol target)
    final: "MpcCarry" = None  # resume state after the last tick


def _shift(a):
    """Drop the leading row, repeat the last (warm-start shift along the
    horizon)."""
    return jnp.concatenate([a[1:], a[-1:]], axis=0)


@partial(jax.jit, static_argnames=("sys", "cfg", "n_steps", "carry_duals"))
def mpc_run(sys, params, cfg: altro.AltroConfig, x0, U_init,
            n_steps: int, noise: Optional[jnp.ndarray] = None,
            xref_path: Optional[jnp.ndarray] = None,
            carry_duals: bool = True,
            resume_from: Optional[MpcCarry] = None,
            k0: int = 0) -> MpcResult:
    """Run ``n_steps`` closed-loop ticks.

    noise: optional (n_steps, nx) additive state disturbance applied after
    each plant step (simulating model mismatch).
    xref_path: optional (k0 + n_steps + N, nx) reference path; tick k tracks
    the window ``xref_path[k0 + k : k0 + k + N]`` (true receding horizon).
    carry_duals: warm-start each tick's AL duals/penalty from the previous
    tick (False = U-only warm start, duals restart at zero).
    resume_from: a checkpointed :class:`MpcCarry` — continue a previous run
    (x0/U_init are then ignored); with a windowed ``xref_path`` also pass
    ``k0`` = number of ticks already run so the reference window lines up
    (a traced scalar — segmented dispatches reuse one compiled program)."""
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
                jnp.asarray(xref_path, dt), (k + k0, 0), (N, nx))
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
        # quality: true violation of the emitted plan (solver convio formula,
        # ALTRO.py:453,461 doubling) + collision margin at the measured state
        convio = jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(st.hx + jnp.abs(st.hx))),
                        jnp.max(jnp.abs(st.hu + jnp.abs(st.hu)))),
            jnp.max(jnp.abs(st.X[-1] - p["Xref"][-1])))
        h_applied = jnp.max(st.hx[0])
        out = (x_next, u0, st.iter, st.converged, st.J,
               convio, h_applied, st.kmax)
        return (x_next, U_next, mu_n, mux_n, lambd_n, rho_n), out

    w = noise if noise is not None else jnp.zeros((n_steps, nx), dt)
    if resume_from is None:
        carry0 = (jnp.asarray(x0, dt), jnp.asarray(U_init, dt),
                  mu0, mux0, lambd0, rho0)
    else:
        carry0 = tuple(jnp.asarray(a, dt) for a in resume_from)
    fin, (Xs, Us, iters, conv, costs, convios, h_apps, kmaxs) = jax.lax.scan(
        tick, carry0, (jnp.arange(n_steps), w))
    X_applied = jnp.concatenate([carry0[0][None], Xs], axis=0)
    return MpcResult(X_applied, Us, iters, conv, costs,
                     convios, h_apps, kmaxs, MpcCarry(*fin))
