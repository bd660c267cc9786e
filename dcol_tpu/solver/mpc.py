"""Receding-horizon MPC on top of the ALTRO solver.

Not present in the reference (single offline solves only); this is the
"multi-host MPC" building block from BASELINE.json: per control tick, re-solve
the horizon from the measured state with warm-started primals/duals, apply the
first control, advance the plant.  The whole closed loop is one ``lax.scan``
(vmappable over scenarios, shardable over a mesh), and warm starts cut the
per-tick ALTRO iterations to a handful.
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


@partial(jax.jit, static_argnames=("sys", "cfg", "n_steps"))
def mpc_run(sys, params, cfg: altro.AltroConfig, x0, U_init,
            n_steps: int, noise: Optional[jnp.ndarray] = None) -> MpcResult:
    """Run ``n_steps`` closed-loop ticks.

    noise: optional (n_steps, nx) additive state disturbance applied after
    each plant step (simulating model mismatch)."""
    dt = U_init.dtype
    nx = sys.nx

    def tick(carry, inp):
        x, U_warm = carry
        k, w = inp
        X0 = jnp.tile(x[None], (sys.N, 1))
        p = dict(params)
        st = altro.solve(sys, p, cfg, X0, U_warm)
        u0 = st.U[0]
        x_next = sys.discrete_dynamics(params, x, u0, k) + w
        # shift warm start: drop the applied control, repeat the last one
        U_next = jnp.concatenate([st.U[1:], st.U[-1:]], axis=0)
        out = (x_next, u0, st.iter, st.converged, st.J)
        return (x_next, U_next), out

    w = noise if noise is not None else jnp.zeros((n_steps, nx), dt)
    (_, _), (Xs, Us, iters, conv, costs) = jax.lax.scan(
        tick, (jnp.asarray(x0, dt), U_init),
        (jnp.arange(n_steps), w))
    X_applied = jnp.concatenate([jnp.asarray(x0, dt)[None], Xs], axis=0)
    return MpcResult(X_applied, Us, iters, conv, costs)
