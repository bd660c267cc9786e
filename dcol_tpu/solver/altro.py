"""AL-iLQR (ALTRO-style) trajectory optimiser in pure JAX.

Faithful to the reference solver's semantics (``ALTRO.py:365-488``):
augmented-Lagrangian outer loop {Riccati backward pass, line-searched forward
pass, regularisation update, dual/penalty update} with the same masks,
recurrences, tolerances and update rules — re-architected TPU-first:

  * dynamics Jacobians by forward-mode AD (exact; replaces FD at
    ``ALTRO.py:77-100``);
  * all per-knot work (Jacobians, constraint values+gradients, cost
    expansions) is ``vmap``-batched over the horizon; each batch of collision
    constraints is ONE fused PDIP solve over (N x n_obs) padded problems;
  * the Riccati recursion and rollouts are ``lax.scan``; the line search is a
    ``lax.while_loop``; the outer loop is a ``lax.while_loop`` — the whole
    solve is a single XLA computation, vmappable over scenarios;
  * constraint values are cached in the solver state so the line search's
    "old cost" needs no re-solve (the reference recomputes it every
    line-search iteration, ``ALTRO.py:215`` — value-identical, wasted PDIPs);
  * failures (regularisation cap, iteration cap) set flags instead of raising,
    so batched scenarios degrade per-member (SURVEY.md §5).

Convergence criteria match the reference exactly: feedforward-gain norm
``kmax < atol`` gates the dual update; ``convio < convio_tol`` (with the
reference's ``|h| + h`` doubling for inequalities, ``ALTRO.py:453,461``)
declares convergence.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dcol_tpu.ops import chol


@dataclasses.dataclass(frozen=True)
class AltroConfig:
    max_iters: int = 3000
    max_ls_iters: int = 20
    atol: float = 1e-2
    convio_tol: float = 1e-4
    rho0: float = 1.0
    phi: float = 10.0
    reg_min: float = 1e-6
    reg_max: float = 1e2
    # Ring-buffer length for per-iteration metrics.  Iterations past this
    # index all write the LAST slot (altro_iteration clamps), so histories of
    # runs longer than metrics_len iterations are silently truncated — plenty
    # for the reference systems (<=60 iters) but raise it for harder
    # scenarios when you need the full history (max_iters is 3000).
    metrics_len: int = 256
    # line-search acceptance slack, relative to (1 + |old_cost|): 0 is the
    # reference's strict decrease (ALTRO.py:227); f32 + warm-started PDIP
    # carries ~1e-5-level evaluation noise that needs a small slack near
    # line-search plateaus
    ls_slack: float = 0.0
    # If the inner minimisation has converged (kmax < atol) but the line
    # search cannot certify a decrease (f32 rounding at an AL plateau), still
    # perform the dual/penalty update instead of escalating regularisation to
    # failure.  The reference requires alpha > 0 (ALTRO.py:444); this relaxed
    # gate exists for f32 rounding only, so it is applied ONLY on sub-f64
    # dtypes — in f64 the solver always uses the reference gate
    # (tests/test_altro.py pins that the relaxed gate never fires on the f64
    # goldens anyway).
    dual_on_stall: bool = True
    # Backward pass gradient source.  False (default): re-solve the PDIP
    # batch at X warm-started from the accepted candidate's solution (1-2
    # polish iterations — cheap and keeps the envelope gradients at full
    # solver tolerance).  True: reuse the accepted solution directly with no
    # solve (AltroState.warm invariant) — saves the polish batch but the
    # unpolished f32 gradients measurably slow outer convergence (49-83 vs
    # 45-51 iterations on the quadrotor), a net loss at batch scale.
    grads_from_accepted: bool = False
    # Number of line-search candidates evaluated per batched evaluation after
    # the alpha=1 probe.  The candidate set is the reference's backtracking
    # sequence {1, 1/2, 1/4, ...} and the largest acceptable candidate wins,
    # so accept semantics are IDENTICAL to sequential backtracking for any
    # value (pinned by tests/test_altro.py).  1 = sequential probing; >1
    # amortises deep backtracking into one fused PDIP batch.  Once inactive
    # members were masked out of the backtracking loop (active=...), chunked
    # evaluation became a clear win under vmap — the loop trip count is the
    # max over the batch, so halving a straggler's chunk count helps every
    # member.  Round-2 (single padded kernel layout): C=1 41.0, C=2 53.0,
    # C=4 45.9 solves/s.  Round-3 (obstacle-kind grouped kernels, chunks
    # ~2x cheaper): C=1 64.3, C=2 67.3, C=4 68.6, C=8 65.4, with C=4 > C=2
    # reproducible across alternating same-process reps (tools/sweep_ls.py).
    ls_parallel: int = 4
    # Unroll factor for the time-sequential scans (rollouts + Riccati).  The
    # per-step tensors are tiny (nx <= 12), so these scans are issue-bound,
    # not FLOP-bound; at batch 1 the line-search rollout alone is ~5 ms of a
    # ~7.6 ms iteration (tools/profile_breakdown.py --merge 1).  Larger
    # unrolls amortise loop overhead at the cost of compile time — the
    # latency-mode config raises it; 8 is the throughput default.
    scan_unroll: int = 8


class Metrics(NamedTuple):
    J: jnp.ndarray
    delta_J: jnp.ndarray
    kmax: jnp.ndarray
    alpha: jnp.ndarray
    reg: jnp.ndarray
    rho: jnp.ndarray
    convio: jnp.ndarray


class AltroState(NamedTuple):
    X: jnp.ndarray        # (N, nx)
    U: jnp.ndarray        # (N-1, nu)
    mu: jnp.ndarray       # (N-1, ncu) control-constraint duals
    mux: jnp.ndarray      # (N, ncx) state-constraint duals
    lambd: jnp.ndarray    # (nx,) goal-constraint duals
    rho: jnp.ndarray      # AL penalty
    reg: jnp.ndarray      # Riccati regularisation
    hx: jnp.ndarray       # (N, ncx) cached constraint values at X
    hu: jnp.ndarray       # (N-1, ncu) cached control-constraint values at U
    warm: tuple           # PDIP solution triple (x, s, z) over (N*n_obs,).
                          # INVARIANT: always the converged solution at the
                          # CURRENT X (initial eval / accepted candidate; a
                          # failed line search keeps the previous one), so
                          # the backward pass reuses it gradient-side with
                          # no re-solve.
    iter: jnp.ndarray     # int32
    converged: jnp.ndarray
    failed: jnp.ndarray
    J: jnp.ndarray
    delta_J: jnp.ndarray
    kmax: jnp.ndarray
    alpha: jnp.ndarray
    convio: jnp.ndarray
    metrics: Metrics


def _where(pred, a, b):
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(jnp.reshape(pred, (1,) * x.ndim), x, y)
        if x.ndim else jnp.where(pred, x, y), a, b)


# Tiny-matrix products written elementwise (unrolled over the static
# contraction dim, nx/nu <= 12): XLA:TPU lowers small dot_generals to padded
# MXU ops, which dominated the Riccati scan's cost (same pathology as the
# round-3 A-B-A Jacobian chain; see geometry/mrp.py).

def _mm(A, B):
    """A @ B, A (..., n, k), B (..., k, m)."""
    return sum(A[..., j:j + 1] * B[..., j, :][..., None, :]
               for j in range(A.shape[-1]))


def _mtm(A, B):
    """A.T @ B, A (..., k, n), B (..., k, m) -> (..., n, m)."""
    return sum(A[..., j, :, None] * B[..., j, None, :]
               for j in range(A.shape[-2]))


def _mv(A, v):
    """A @ v, A (..., n, k), v (..., k) -> (..., n)."""
    return sum(A[..., :, j] * v[..., j, None] for j in range(A.shape[-1]))


def _mtv(A, v):
    """A.T @ v, A (..., k, n), v (..., k) -> (..., n)."""
    return sum(A[..., j, :] * v[..., j, None] for j in range(A.shape[-2]))


def eval_mask(mu, h):
    """AL active mask: active iff the dual is positive or the constraint is
    violated (ALTRO.py:16-31)."""
    return ((mu > 0) | (h > 0)).astype(h.dtype)


# ---------------------------------------------------------------------------
# Cost
# ---------------------------------------------------------------------------

def quad_cost(sys, params, X, U):
    """Sum of LQR tracking terms (running + terminal), ALTRO.py:148-180."""
    dX = X - params["Xref"]
    dU = U - params["Uref"]
    run_x = 0.5 * jnp.sum(dX[:-1] * _mv(params["Q"], dX[:-1]))
    run_u = 0.5 * jnp.sum(dU * _mv(params["R"], dU))
    term = 0.5 * jnp.sum(dX[-1] * _mv(params["Qf"], dX[-1]))
    return run_x + run_u + term


def al_cost(params, X, hx, hu, mu, mux, lambd, rho):
    """Augmented-Lagrangian penalty terms (ALTRO.py:120-144)."""
    mask_u = eval_mask(mu, hu)
    c_u = jnp.sum(mu * hu) + 0.5 * rho * jnp.sum(mask_u * hu * hu)
    mask_x = eval_mask(mux, hx)
    c_x = jnp.sum(mux * hx) + 0.5 * rho * jnp.sum(mask_x * hx * hx)
    dxN = X[-1] - params["Xref"][-1]
    c_g = jnp.sum(lambd * dxN) + 0.5 * rho * jnp.sum(dxN * dxN)
    return c_u + c_x + c_g


def total_cost(sys, params, X, U, hx, hu, mu, mux, lambd, rho):
    return quad_cost(sys, params, X, U) + al_cost(
        params, X, hx, hu, mu, mux, lambd, rho)


def eval_constraints(sys, params, X, U, warm=None):
    """(hx (N, ncx), hu (N-1, ncu), warm); the hx batch is one fused PDIP
    solve, warm-started from a previous nearby evaluation when given."""
    hx, new_warm = sys.constraints_x_traj(params, X, warm=warm)
    hu = jax.vmap(lambda u: sys.constraints_u(params, u))(U)
    return hx, hu, new_warm


# ---------------------------------------------------------------------------
# Backward pass (Riccati recursion with AL terms), ALTRO.py:242-338
# ---------------------------------------------------------------------------

def backward_pass(sys, params, X, U, mu, mux, lambd, rho, reg, warm=None,
                  grads_from_accepted=False, skip=None, unroll: int = 8):
    """``skip``: scalar bool — this member's output is discarded by the
    caller (converged/failed member of a lock-step batch); its polish PDIP
    solve runs zero iterations."""
    N = sys.N
    nx, nu = sys.nx, sys.nu
    dt = X.dtype
    Q, R, Qf = params["Q"], params["R"], params["Qf"]

    ks = jnp.arange(N - 1)
    if getattr(sys, "fd_jacobians", False):
        A, B = jax.vmap(
            lambda x, u, k: sys.dynamics_jacobians(params, x, u, k))(
                X[:-1], U, ks)
    else:
        # Exact forward-mode Jacobians with the TANGENT axis vmapped OUTSIDE
        # the knot axis.  Same math as vmap(jacfwd) per knot, but the hot
        # intermediates become (tangent=16, knots=99) instead of (99, 16):
        # under the scenario vmap TPU tiles the two minor dims, so the knot
        # axis lands on the 128-lane axis at 77% utilization instead of the
        # tangent axis at 12% — the jaxpr is identical FLOPs, ~4x less
        # padded issue (docs/PROFILE.md round-5b).
        f = lambda X_, U_: jax.vmap(
            lambda x, u, k: sys.discrete_dynamics(params, x, u, k))(
                X_, U_, ks)

        def push(e):
            ex = jnp.broadcast_to(e[:nx], (N - 1, nx))
            eu = jnp.broadcast_to(e[nx:], (N - 1, nu))
            return jax.jvp(f, (X[:-1], U), (ex, eu))[1]  # (N-1, nx)

        T = jax.vmap(push)(jnp.eye(nx + nu, dtype=dt))   # (nx+nu, N-1, nx)
        A = jnp.moveaxis(T[:nx], 0, -1)                  # (N-1, nx, nx)
        B = jnp.moveaxis(T[nx:], 0, -1)                  # (N-1, nx, nu)

    # constraint values + envelope gradients at X.  Default: one PDIP batch
    # warm-started from the accepted candidate's converged solution at this
    # exact X (1-2 polish iterations); optionally reuse that solution with no
    # solve (see AltroConfig.grads_from_accepted).
    if warm is not None and grads_from_accepted:
        hx, gx = sys.constraints_x_vg_from_solution(params, X, warm)
    else:
        hx, gx, _ = sys.constraints_x_vg_traj(params, X, warm=warm, skip=skip)
    hu = jax.vmap(lambda u: sys.constraints_u(params, u))(U)
    gu = jax.vmap(lambda u: sys.constraints_u_grad(params, u))(U)

    mask_x = eval_mask(mux, hx)                      # (N, ncx)
    mask_u = eval_mask(mu, hu)                       # (N-1, ncu)

    dX = X - params["Xref"]
    wx = mux[:-1] + rho * mask_x[:-1] * hx[:-1]      # (N-1, ncx)
    l_x = _mv(Q, dX[:-1]) + jnp.sum(gx[:-1] * wx[..., None], axis=-2)
    l_xx = Q[None] + rho * _mtm(gx[:-1] * mask_x[:-1, :, None], gx[:-1])
    dU = U - params["Uref"]
    wu = mu + rho * mask_u * hu
    l_u = _mv(R, dU) + jnp.sum(gu * wu[..., None], axis=-2)
    l_uu = R[None] + rho * _mtm(gu * mask_u[..., None], gu)

    # terminal value function incl. AL state + goal terms (ALTRO.py:267-287)
    Vx_N = (_mv(Qf, dX[-1])
            + _mtv(gx[-1], mux[-1] + rho * mask_x[-1] * hx[-1])
            + lambd + rho * dX[-1])
    Vxx_N = (Qf + rho * _mtm(gx[-1] * mask_x[-1][:, None], gx[-1])
             + rho * jnp.eye(nx, dtype=dt))

    I_nx = jnp.eye(nx, dtype=dt)

    def step(carry, inp):
        Vx, Vxx, dJ = carry
        A_t, B_t, lx_t, lu_t, lxx_t, luu_t = inp
        Vxx_r = Vxx + reg * I_nx
        VA = _mm(Vxx_r, A_t)
        VB = _mm(Vxx_r, B_t)
        Qu = lu_t + _mtv(B_t, Vx)
        Quu = luu_t + _mtm(B_t, VB)
        Qux = _mtm(B_t, VA)
        L = chol.chol_factor(Quu)
        k_t = chol.chol_solve(L, Qu)
        K_t = chol.chol_solve(L, jnp.swapaxes(Qux, -1, -2)).T
        Abar = A_t - _mm(B_t, K_t)
        luuK = _mm(luu_t, K_t)
        Vxx_new = lxx_t + _mtm(K_t, luuK) + _mtm(Abar, _mm(Vxx, Abar))
        Bk = _mv(B_t, k_t)
        Vx_new = (lx_t - _mtv(K_t, lu_t) + _mtv(K_t, _mv(luu_t, k_t))
                  + _mtv(Abar, Vx - _mv(Vxx, Bk)))
        dJ = dJ + jnp.sum(Qu * k_t, axis=-1)
        return (Vx_new, Vxx_new, dJ), (K_t, k_t)

    # unroll: the per-step tensors are tiny (nx<=12), so the scan is
    # dispatch-latency-bound on TPU; unrolling fuses several steps per loop
    # iteration
    inputs = (A, B, l_x, l_u, l_xx, l_uu)
    (Vx0, Vxx0, delta_J), (K, k) = jax.lax.scan(
        step, (Vx_N, Vxx_N, jnp.zeros((), dt)), inputs, reverse=True,
        unroll=unroll)
    kmax = jnp.max(jnp.linalg.norm(k, axis=-1))  # ALTRO.py:34-48
    return K, k, delta_J, kmax


# ---------------------------------------------------------------------------
# Forward pass (backtracking line search), ALTRO.py:183-239
# ---------------------------------------------------------------------------

def rollout(sys, params, X, U, K, k, alpha, unroll: int = 8):
    ks = jnp.arange(sys.N - 1)

    def step(x, inp):
        X_t, U_t, K_t, k_t, t = inp
        u = U_t - _mv(K_t, x - X_t) - alpha * k_t
        x_next = sys.discrete_dynamics(params, x, u, t)
        return x_next, (x, u)

    xN, (Xs, Un) = jax.lax.scan(step, X[0], (X[:-1], U, K, k, ks),
                                unroll=unroll)
    Xn = jnp.concatenate([Xs, xN[None]], axis=0)
    return Xn, Un


def initial_rollout(sys, params, x0, U, unroll: int = 8):
    def step(x, inp):
        u, t = inp
        return sys.discrete_dynamics(params, x, u, t), x

    xN, Xs = jax.lax.scan(step, x0, (U, jnp.arange(sys.N - 1)),
                          unroll=unroll)
    return jnp.concatenate([Xs, xN[None]], axis=0)


def forward_pass(sys, params, cfg, X, U, K, k, mu, mux, lambd, rho, hx, hu,
                 warm, active=None):
    """Backtracking line search with chunked PARALLEL candidate evaluation.

    The reference halves alpha sequentially until the cost decreases
    (ALTRO.py:212-234).  Here each chunk of `ls_parallel` candidate alphas is
    evaluated in one batched rollout + one fused PDIP batch, and the largest
    acceptable candidate wins — the accepted alpha is identical to the
    sequential algorithm's.

    ``active``: under vmap the backtracking while_loop runs in lock-step
    across the scenario batch, so an already-converged/failed member (whose
    result the caller discards via its active mask) would otherwise fail the
    strict-decrease test at its optimum and drag the WHOLE batch through all
    ``max_ls_iters`` chunk evaluations every remaining iteration — measured
    62-87 ms/iter vs 18 ms mid-solve at batch 64.  Passing the caller's
    active flag seeds ``found`` for inactive members, so they never force
    phase-2 chunks.  Active members' results are bit-identical either way."""
    old_cost = total_cost(sys, params, X, U, hx, hu, mu, mux, lambd, rho)
    dt = X.dtype
    slack = cfg.ls_slack * (1.0 + jnp.abs(old_cost))
    L = cfg.max_ls_iters
    C = max(1, min(cfg.ls_parallel, max(1, L - 1)))
    n_chunks = -(-(L - 1) // C) if L > 1 else 0
    alphas_all = (0.5 ** jnp.arange(1 + n_chunks * C)).astype(dt)
    valid_all = jnp.arange(1 + n_chunks * C) < L

    def eval_candidates(a_c, valid_c, w, skip=None):
        """One batched evaluation of a static-size set of candidate alphas:
        candidates are FLATTENED into the PDIP batch (one solver call over
        C*N knots) — a pallas_call under two nested vmaps (scenarios x
        candidates) miscompiles on TPU, and the flat batch is more
        lane-efficient anyway.  ``skip``: scalar bool — this member's result
        is discarded, so its PDIP lanes run zero iterations."""
        Cc = a_c.shape[0]
        N = sys.N
        Xn, Un = jax.vmap(
            lambda a: rollout(sys, params, X, U, K, k, a,
                              unroll=cfg.scan_unroll))(a_c)
        Xf = Xn.reshape(Cc * N, sys.nx)
        w_t = jax.tree_util.tree_map(
            lambda a: jnp.tile(a, (Cc,) + (1,) * (a.ndim - 1)), w)
        hxf, wf = sys.constraints_x_traj(params, Xf, warm=w_t, skip=skip)
        hxn = hxf.reshape(Cc, N, -1)
        wn = jax.tree_util.tree_map(
            lambda a: a.reshape((Cc, a.shape[0] // Cc) + a.shape[1:]), wf)
        hun = jax.vmap(jax.vmap(lambda u: sys.constraints_u(params, u)))(Un)
        Jn = jax.vmap(
            lambda Xc, Uc, hxc, huc: total_cost(
                sys, params, Xc, Uc, hxc, huc, mu, mux, lambd, rho)
        )(Xn, Un, hxn, hun)
        ok = valid_c & (Jn < old_cost + slack)
        idx = jnp.argmax(ok)  # first (largest-alpha) acceptable candidate
        pick = lambda a: a[idx]
        cand = (pick(Xn), pick(Un), pick(hxn), pick(hun), pick(Jn),
                pick(a_c), jax.tree_util.tree_map(pick, wn))
        w_last = jax.tree_util.tree_map(lambda a: a[-1], wn)
        return jnp.any(ok), cand, w_last

    zero = jnp.zeros((), dt)
    sel0 = (X, U, hx, hu, old_cost, zero, warm)  # alpha = 0 fallback

    # phase 1: the full step alpha = 1 alone (accepted on ~90% of
    # iterations, so the common case costs ONE constraint batch, like the
    # reference's first attempt — without per-scenario attempt stragglers).
    # Inactive members probe alpha = 0 with their PDIP lanes SKIPPED: the
    # rollout reproduces their unchanged trajectory, the incoming warm is
    # the converged solution at exactly that trajectory (AltroState.warm
    # invariant), and the solver returns it untouched at zero iterations.
    a1 = alphas_all[:1]
    skip1 = None
    if active is not None:
        a1 = jnp.where(active, a1, jnp.zeros((1,), dt))
        skip1 = ~active
    ok1, cand1, w1 = eval_candidates(a1, valid_all[:1], warm, skip=skip1)
    sel = _where(ok1, cand1, sel0)
    found0 = ok1 if active is None else (ok1 | ~active)

    # phase 2: chunks of C candidates {1/2, 1/4, ...} only while unaccepted.
    # Under vmap the while_loop runs in lock-step, so members that already
    # accepted a candidate still execute every remaining chunk another member
    # needs.  Their results are DISCARDED (the ~found guard below), so make
    # their lanes free: candidate alphas := the member's selected alpha (the
    # batched rollout then reproduces its accepted trajectory bit-exactly),
    # warm := the selected candidate's converged PDIP solution, and the PDIP
    # solve is SKIPPED outright for them (skip=found: every lane enters the
    # kernel done, so their batch tiles exit the while_loop after zero
    # iterations and return the converged warm values).  A straggler's deep
    # backtrack no longer costs the whole batch full-price PDIP chunks —
    # only the rollout/cost evaluation stays lock-step.  Active
    # still-searching members see bit-identical inputs either way.
    def body(carry):
        ci, found, sel, w = carry
        a_c = jax.lax.dynamic_slice(alphas_all, (1 + ci * C,), (C,))
        v_c = jax.lax.dynamic_slice(valid_all, (1 + ci * C,), (C,))
        a_c = jnp.where(found, sel[5], a_c)
        w_in = _where(found, sel[6], w)
        any_ok, cand, w_last = eval_candidates(a_c, v_c, w_in, skip=found)
        sel = _where(any_ok & ~found, cand, sel)
        return ci + 1, found | any_ok, sel, w_last

    def cond(carry):
        ci, found, _, _ = carry
        return (ci < n_chunks) & ~found

    _, found, sel, w_last = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), found0, sel, w1))
    Xn, Un, hxn, hun, Jn, alpha, warmn = sel
    # on total failure the fallback (alpha = 0, unchanged trajectories,
    # ALTRO.py:236-239) keeps the INCOMING warm: it is the converged
    # solution at the unchanged X (the AltroState.warm invariant)
    return Xn, Un, hxn, hun, Jn, alpha, warmn


# ---------------------------------------------------------------------------
# Outer AL iteration
# ---------------------------------------------------------------------------

def make_initial_state(sys, params, cfg, X0, U0, duals=None,
                       rho=None) -> AltroState:
    """Initial solver state: rollout from X0[0] under U0, zero duals.

    ``duals`` = (mu, mux, lambd) and ``rho`` optionally seed the
    augmented-Lagrangian state from a previous nearby solve (MPC
    warm-starting across ticks); defaults reproduce the reference's cold
    start (ALTRO.py:396-403)."""
    dt = jnp.result_type(U0)
    U = jnp.asarray(U0, dt)
    X = initial_rollout(sys, params, jnp.asarray(X0[0], dt), U,
                        unroll=cfg.scan_unroll)
    hx, hu, warm = eval_constraints(sys, params, X, U)
    warm = jax.tree_util.tree_map(lambda a: a.astype(dt), warm)
    if duals is None:
        mu = jnp.zeros((sys.N - 1, sys.ncu), dt)
        mux = jnp.zeros((sys.N, sys.ncx), dt)
        lambd = jnp.zeros((sys.nx,), dt)
    else:
        mu, mux, lambd = (jnp.asarray(d, dt) for d in duals)
    rho0 = jnp.asarray(cfg.rho0 if rho is None else rho, dt)
    J0 = total_cost(sys, params, X, U, hx, hu, mu, mux, lambd, rho0)
    z = jnp.zeros((), dt)
    m = Metrics(*(jnp.zeros((cfg.metrics_len,), dt) for _ in range(7)))
    return AltroState(
        X=X, U=U, mu=mu, mux=mux, lambd=lambd,
        rho=rho0, reg=jnp.asarray(cfg.reg_min, dt),
        hx=hx, hu=hu, warm=warm, iter=jnp.zeros((), jnp.int32),
        converged=jnp.zeros((), bool), failed=jnp.zeros((), bool),
        J=J0, delta_J=z, kmax=z, alpha=z, convio=z, metrics=m)


def altro_iteration(sys, params, cfg, st: AltroState,
                    active=None) -> AltroState:
    """One AL iteration.  ``active`` (optional bool) marks this member as
    still-active in a batched solve; inactive members skip line-search
    backtracking work their caller will discard (see forward_pass)."""
    dt = st.X.dtype
    K, k, delta_J, kmax = backward_pass(
        sys, params, st.X, st.U, st.mu, st.mux, st.lambd, st.rho, st.reg,
        warm=st.warm, grads_from_accepted=cfg.grads_from_accepted,
        skip=None if active is None else ~active, unroll=cfg.scan_unroll)
    X, U, hx, hu, J, alpha, warm = forward_pass(
        sys, params, cfg, st.X, st.U, K, k, st.mu, st.mux, st.lambd, st.rho,
        st.hx, st.hu, st.warm, active=active)

    # regularisation update (ALTRO.py:51-74); at-cap failure sets a flag
    failed = st.failed | ((alpha == 0.0) & (st.reg >= cfg.reg_max))
    reg = jnp.where(alpha == 0.0, jnp.minimum(cfg.reg_max, st.reg * 10.0),
                    jnp.where(alpha == 1.0,
                              jnp.maximum(cfg.reg_min, st.reg / 10.0), st.reg))

    # dual + penalty update, gated on (alpha > 0) & (kmax < atol)
    # (ALTRO.py:444-481); the stall relaxation applies only below f64
    dual_on_stall = cfg.dual_on_stall and jnp.dtype(dt) != jnp.float64
    do_dual = (kmax < cfg.atol) & ((alpha > 0.0) | dual_on_stall)
    mask_u = eval_mask(st.mu, hu)
    mu_new = jnp.maximum(0.0, st.mu + st.rho * mask_u * hu)
    convio_u = jnp.max(jnp.abs(hu + jnp.abs(hu)))
    mask_x = eval_mask(st.mux, hx)
    mux_new = jnp.maximum(0.0, st.mux + st.rho * mask_x * hx)
    convio_x = jnp.max(jnp.abs(hx + jnp.abs(hx)))
    dxN = X[-1] - params["Xref"][-1]
    lambd_new = st.lambd + st.rho * dxN
    convio = jnp.maximum(jnp.maximum(convio_u, convio_x),
                         jnp.max(jnp.abs(dxN)))
    converged = do_dual & (convio < cfg.convio_tol)
    rho = jnp.where(do_dual & ~converged, st.rho * cfg.phi, st.rho)
    mu = jnp.where(do_dual, mu_new, st.mu)
    mux = jnp.where(do_dual, mux_new, st.mux)
    lambd = jnp.where(do_dual, lambd_new, st.lambd)
    convio_out = jnp.where(do_dual, convio, st.convio)

    it = st.iter
    slot = jnp.minimum(it, cfg.metrics_len - 1)
    m = st.metrics
    m = Metrics(
        J=m.J.at[slot].set(J.astype(dt)),
        delta_J=m.delta_J.at[slot].set(delta_J.astype(dt)),
        kmax=m.kmax.at[slot].set(kmax.astype(dt)),
        alpha=m.alpha.at[slot].set(alpha.astype(dt)),
        reg=m.reg.at[slot].set(reg.astype(dt)),
        rho=m.rho.at[slot].set(rho.astype(dt)),
        convio=m.convio.at[slot].set(convio_out.astype(dt)),
    )
    return AltroState(
        X=X, U=U, mu=mu, mux=mux, lambd=lambd, rho=rho, reg=reg,
        hx=hx, hu=hu, warm=warm, iter=it + 1, converged=converged,
        failed=failed,
        J=J, delta_J=delta_J, kmax=kmax, alpha=alpha, convio=convio_out,
        metrics=m)


@partial(jax.jit, static_argnames=("sys", "cfg"))
def solve(sys, params, cfg: AltroConfig, X0, U0, duals=None,
          rho=None) -> AltroState:
    """Full jitted solve: init rollout + while_loop of AL iterations.
    vmap over (params, X0, U0) for scenario batches — per-scenario
    convergence freezes members via the active mask.  ``duals``/``rho``
    warm-start the AL state (see make_initial_state)."""
    st0 = make_initial_state(sys, params, cfg, X0, U0, duals=duals, rho=rho)

    def body(st):
        active = ~(st.converged | st.failed)
        new = altro_iteration(sys, params, cfg, st, active=active)
        return _where(active, new, st)

    def cond(st):
        return (st.iter < cfg.max_iters) & ~(st.converged | st.failed)

    return jax.lax.while_loop(cond, body, st0)


def solve_verbose(sys, params, cfg: AltroConfig, X0, U0, callback=None,
                  print_table: bool = True) -> AltroState:
    """Python-loop variant printing the reference's iteration table
    (ALTRO.py:437-440).  ``callback(itr, st)``, if given, runs host-side
    after every iteration — e.g. to capture the X/U trajectory history the
    reference keeps in ``X_hist``/``U_hist`` (ALTRO.py:402-403,419-420) for
    the per-iteration trajectory plots."""
    step = jax.jit(
        lambda p, s: altro_iteration(sys, p, cfg, s))
    st = jax.jit(
        lambda p, a, b: make_initial_state(sys, p, cfg, a, b))(params, X0, U0)
    for itr in range(cfg.max_iters):
        st = step(params, st)
        if print_table:
            if itr % 50 == 0:
                print("iter     J           dJ        |d|         a        reg"
                      "         rho")
                print("-" * 69)
            print(f"{itr+1:3d}   {float(st.J):10.3e}  {float(st.delta_J):9.2e}"
                  f"  {float(st.kmax):9.2e}  {float(st.alpha):6.4f}"
                  f"   {float(st.reg):9.2e}   {float(st.rho):9.2e}")
        if callback is not None:
            callback(itr, st)
        if bool(st.converged):
            if print_table:
                print(f"Convergence reached in {itr} iterations.")
            break
        if bool(st.failed):
            if print_table:
                print("Solve failed (regularization cap reached).")
            break
    return st
