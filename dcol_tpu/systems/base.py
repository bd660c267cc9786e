"""System protocol + collision-scene machinery shared by all systems.

The reference couples each system to the solver through a module-level
duck-typed protocol (``discrete_dynamics``, ``inequality_constraints_*``;
e.g. ``systems/piano_mover.py:28-127``) plus a mutable params dict.  Here a
:class:`System` is a *static* object (hashable config + pure functions) and
all run-time data (references, bounds, obstacle poses) lives in a ``params``
pytree, so everything jits, differentiates, and batches over scenarios.

Collision constraints: one :class:`CollisionScene` per system holds the robot
shape and the obstacle shapes, grouped by their EXACT pair layout
(:attr:`CollisionScene.groups`).  Per trajectory, each group's
(knots x obstacles) pair problems are assembled (trace-time loop over the
statically heterogeneous obstacles) and solved as ONE batched PDIP call per
group — zero padding rows; gradients come from the envelope theorem in the
same pass (fusing the reference's separate ``inequality_constraints_x`` /
``_x_grad`` solve pairs, SURVEY.md §7.4).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from dcol_tpu.geometry import assembly
from dcol_tpu.geometry.primitives import Shape
from dcol_tpu.ops.cones import ConeLayout
from dcol_tpu.ops.pdip import solve_socp


@dataclasses.dataclass(frozen=True)
class ProximityOptions:
    tol: float = 1e-6        # reference pdip_tol (proximity/proximity.py:6)
    max_iters: int = 30
    jitter: float = 0.0
    backend: str = "xla"     # "xla" (batched lax ops) or "pallas" (fused kernel)
    # pallas batch-tile width (lanes per grid step); clamped down to the
    # padded batch at trace time, so small batches don't pay for unused lanes.
    # 1024 measured 27% faster than 256 on the quadrotor constraint batch
    # (70400 pair problems: 12.8 -> 9.3 ms; benchmarks/probe_iter_cost.py)
    block: int = 1024
    # Interior margin for warm starts: a previous optimum's (s, z) sit at
    # the cone boundary (s.z ~ tol), where NT scaling is ill-conditioned in
    # f32, so warm_initialize shifts them inward by this much before
    # re-solving.  Larger = more robust, but every warm solve then pays
    # iterations re-converging from the shifted point.
    warm_margin: float = 1e-3
    # Interior margin for the backward pass's POLISH solve specifically: it
    # re-solves at the SAME trajectory its warm start converged at (the
    # accepted candidate's solution — AltroState.warm invariant), so the
    # shift is pure re-convergence work; a much smaller margin suffices and
    # saves ~1 Mehrotra iteration per polish batch.  The forward probe's
    # warm start crosses a trajectory CHANGE and keeps the robust margin.
    polish_margin: float = 1e-4
    # Latency mode: merge ALL obstacle groups into ONE padded-layout batch
    # (the scene-wide (nv, n_ort, S_PAD, S_PAD) shape, provably equivalent —
    # assembly.py module docstring) so every constraint batch is a single
    # kernel launch instead of one per obstacle kind.  Each launch pays fixed
    # sequencing/dispatch cost that dominates at tiny batches (batch-1 MPC /
    # single-solve latency); at throughput batches the exact grouped layouts
    # win on instruction count.  Default False = exact groups.
    merge_groups: bool = False


@dataclasses.dataclass(frozen=True)
class CollisionScene:
    robot: Shape
    obstacles: Tuple[Shape, ...]
    opts: ProximityOptions = ProximityOptions()

    @property
    def n_obs(self) -> int:
        return len(self.obstacles)

    @property
    def dims(self) -> Tuple[int, int]:
        return assembly.scene_dims(self.robot, self.obstacles)

    @property
    def cone_layout(self) -> ConeLayout:
        """Layout of the ONE-SHAPE-FITS-ALL padded problem (see
        :meth:`assemble`); the hot path instead uses per-group exact
        layouts (:attr:`groups`)."""
        _, n_ort = self.dims
        return ConeLayout(n_ort, assembly.S_PAD, assembly.S_PAD)

    def pair_layout(self, i: int):
        nv, n_ort = self.dims
        return assembly.make_layout(self.robot, self.obstacles[i], nv, n_ort)

    # -- obstacle groups (exact layouts, zero padding rows) ----------------
    def member_layout(self, i: int) -> assembly.PairLayout:
        """The PairLayout obstacle ``i`` is assembled with: its exact layout
        (grouped mode) or the scene-wide padded layout (merge_groups)."""
        if self.opts.merge_groups:
            nv, n_ort = self.dims
            return assembly.make_layout(self.robot, self.obstacles[i],
                                        nv, n_ort)
        return assembly.exact_layout(self.robot, self.obstacles[i])

    @property
    def groups(self) -> Tuple[Tuple[assembly.PairLayout, Tuple[int, ...]], ...]:
        """Obstacles grouped by their EXACT pair layout.  Each group's pair
        problems share one static shape with zero padding rows (no box rows,
        no vacuous SOCs — a polytope-polytope group is a pure-orthant LP),
        so each group is one batched solve / one pallas kernel.  Static:
        derived from the shape tuple only.

        With ``opts.merge_groups`` (latency mode) there is instead ONE group
        of all obstacles under the scene-wide padded layout; the group's
        ``lay`` element is then only meaningful for its shared cone dims
        (n_ort, s1, s2, nv) — per-obstacle assembly uses
        :meth:`member_layout`."""
        if self.opts.merge_groups:
            return ((self.member_layout(0), tuple(range(self.n_obs))),)
        groups = []  # [(PairLayout, [obstacle indices])]
        for i, obs in enumerate(self.obstacles):
            lay = assembly.exact_layout(self.robot, obs)
            for g in groups:
                if g[0] == lay:
                    g[1].append(i)
                    break
            else:
                groups.append((lay, [i]))
        return tuple((lay, tuple(idx)) for lay, idx in groups)

    @property
    def group_order(self) -> Tuple[int, ...]:
        """Obstacle indices in grouped order (concatenation of the groups)."""
        return tuple(i for _, idx in self.groups for i in idx)

    @property
    def inv_perm(self) -> Tuple[int, ...]:
        """Permutation taking grouped-order columns back to obstacle order."""
        order = self.group_order
        inv = [0] * len(order)
        for pos, i in enumerate(order):
            inv[i] = pos
        return tuple(inv)

    # -- assembly ---------------------------------------------------------
    def assemble(self, r, p, obs_r, obs_p):
        """Stacked problems for one robot pose vs all obstacles, padded to
        ONE static shape (the original all-pairs-one-kernel scheme; kept for
        benchmarks/diagnostics — the solver path uses :meth:`assemble_groups`).

        r, p: (3,) robot pose; obs_r, obs_p: (n_obs, 3).
        Returns c (n_obs, nv), G (n_obs, nr, nv), h (n_obs, nr).
        """
        cs, Gs, hs = [], [], []
        for i, obs in enumerate(self.obstacles):
            c, G, h = assembly.assemble_pair(
                self.robot, obs, self.pair_layout(i), r, p, obs_r[i], obs_p[i])
            cs.append(c); Gs.append(G); hs.append(h)
        return jnp.stack(cs), jnp.stack(Gs), jnp.stack(hs)

    def assemble_groups(self, r, p, obs_r, obs_p):
        """Per-group stacked problems for one robot pose: a list (one entry
        per group) of (c (n_g, nv_g), G (n_g, nr_g, nv_g), h (n_g, nr_g))
        with the group's exact layout — zero padding rows."""
        out = []
        for lay, idx in self.groups:
            cs, Gs, hs = [], [], []
            for i in idx:
                c, G, h = assembly.assemble_pair(
                    self.robot, self.obstacles[i], self.member_layout(i),
                    r, p, obs_r[i], obs_p[i])
                cs.append(c); Gs.append(G); hs.append(h)
            out.append((jnp.stack(cs), jnp.stack(Gs), jnp.stack(hs)))
        return out

    def assemble_groups_tiled(self, rs, ps, obs_r, obs_p):
        """Per-group kernel-tile operands for a BATCH of robot poses
        rs/ps (T, 3): list of ``(cl, Gl, hl, B)`` with
        cl (nv, nt, 128), Gl (nv*nr, nt, 128), hl (nr, nt, 128) and
        B = T * n_g the true batch (member order t*n_g + g, matching the
        dense path's flatten).

        Built ENTRY-WISE (assembly.assemble_pair_entries): every G/h entry
        is one scalar over the pose batch, stacked straight into the tile
        layout — no (B, nr, nv) dense intermediate and no batch-to-lanes
        transpose (which dominates the dense path's constraint-call cost;
        docs/PROFILE.md round-5c)."""
        from dcol_tpu.ops.pdip_pallas import tile_dims

        T = rs.shape[0]
        dt = rs.dtype
        out = []
        for lay, idx in self.groups:
            n_g = len(idx)
            B = T * n_g
            _, Bp = tile_dims(B, self.opts.block)
            ents = [assembly.assemble_pair_entries(
                self.robot, self.obstacles[i], self.member_layout(i),
                rs, ps, obs_r[i], obs_p[i]) for i in idx]
            nv = self.member_layout(idx[0]).nv
            nr = self.member_layout(idx[0]).nr

            def vals(get):
                """(T, n_g) from one entry per group member."""
                return jnp.stack(
                    [jnp.broadcast_to(jnp.asarray(get(e), dt), (T,))
                     for e in ents], axis=-1)

            grows = [vals(lambda e, v=v, r=r: e[1][r][0][v])
                     for v in range(nv) for r in range(nr)]
            hrows = [vals(lambda e, r=r: e[1][r][1]) for r in range(nr)]
            crows = [vals(lambda e, v=v: e[0][v]) for v in range(nv)]

            def tile(rows):
                a = jnp.stack(rows).reshape(len(rows), B)
                pad = Bp - B
                if pad:
                    a = jnp.concatenate(
                        [a, jnp.repeat(a[:, -1:], pad, axis=1)], axis=1)
                return a.reshape(len(rows), Bp // 128, 128)

            out.append((tile(crows), tile(grows), tile(hrows), B))
        return out

    # -- solver dispatch --------------------------------------------------
    def _solve(self, c, G, h, lay: ConeLayout, warm=None, skip=None,
               margin=None, tiled=None, batch_size=None):
        """Solve a flat batch of pair problems with the configured backend.
        c/G/h have one leading batch dim; ``warm`` is an optional (x, s, z)
        triple from a previous nearby solve; ``skip`` (bool, broadcastable to
        the batch) marks members whose result the caller discards — they
        cost zero solver iterations (see solve_socp).  ``margin`` overrides
        the warm-start interior margin (static)."""
        wm = self.opts.warm_margin if margin is None else margin
        if self.opts.backend == "pallas":
            from dcol_tpu.ops.pdip_pallas import solve_socp_pallas

            return solve_socp_pallas(
                c, G, h, lay, tol=self.opts.tol,
                max_iters=self.opts.max_iters, jitter=self.opts.jitter,
                block=self.opts.block, warm=warm, skip=skip,
                warm_margin=wm, tiled=tiled, batch_size=batch_size)
        return solve_socp(c, G, h, lay, tol=self.opts.tol,
                          max_iters=self.opts.max_iters,
                          jitter=self.opts.jitter, warm=warm, skip=skip,
                          warm_margin=wm)

    def _solve_groups_traj(self, rs, ps, obs_r, obs_p, warm=None, skip=None,
                           margin=None):
        """One batched solve PER GROUP over a trajectory of poses (T, 3).
        Returns (list of per-group solutions with flat (T*n_g) batch,
        warm tuple).  ``warm`` is the matching tuple from a previous call;
        ``skip`` is a scalar (or (T,)) bool marking discarded results."""
        T = rs.shape[0]
        # NOTE: the entry-wise tile-layout assembly (assemble_groups_tiled +
        # _solve(tiled=...)) was measured SLOWER end-to-end than this dense
        # path (batch-64 208 -> 138 solves/s): inside the fused solve XLA
        # already folds the batch-to-lanes transpose into the pallas operand
        # copy, while the entry-wise build pays ~900 small stack ops per
        # call.  Kept (tested) for future revisits; see docs/PROFILE.md.
        grouped = jax.vmap(
            lambda r_, p_: self.assemble_groups(r_, p_, obs_r, obs_p))(rs, ps)
        sols = []
        for gi, (lay, idx) in enumerate(self.groups):
            n_g = len(idx)
            w = warm[gi] if warm is not None else None
            sk = (None if skip is None
                  else jnp.broadcast_to(
                      jnp.reshape(skip, (-1, 1)), (T, n_g)).reshape(T * n_g))
            c, G, h = grouped[gi]
            flat = lambda a: a.reshape((T * n_g,) + a.shape[2:])
            sols.append(self._solve(
                flat(c), flat(G), flat(h),
                ConeLayout(lay.n_ort, lay.s1, lay.s2), warm=w, skip=sk,
                margin=margin))
        return sols, tuple((s.x, s.s, s.z) for s in sols)

    def _gather_cols(self, per_group, T):
        """Stack per-group (T, n_g, ...) arrays and restore obstacle order on
        axis 1."""
        cat = jnp.concatenate(per_group, axis=1)
        return cat[:, jnp.asarray(self.inv_perm)]

    # -- proximity values -------------------------------------------------
    def alphas(self, r, p, obs_r, obs_p):
        """(n_obs,) proximity alphas for one robot pose (value only)."""
        a, _ = self.alphas_traj(r[None], p[None], obs_r, obs_p)
        return a[0]

    def alphas_traj(self, rs, ps, obs_r, obs_p, warm=None, skip=None):
        """(alphas (T, n_obs), solver warm state) for a trajectory of robot
        poses rs/ps (T, 3): assembly is vmapped per knot, then each obstacle
        GROUP's (T x n_g) pair problems are one flat batched solve (one
        kernel launch per group on the pallas backend)."""
        T = rs.shape[0]
        sols, new_warm = self._solve_groups_traj(rs, ps, obs_r, obs_p, warm,
                                                 skip=skip)
        a = self._gather_cols(
            [s.x[:, 3].reshape(T, -1) for s in sols], T)
        return a, new_warm

    def alphas_and_grads_traj(self, rs, ps, obs_r, obs_p, warm=None,
                              skip=None, margin=None):
        """(alphas (T, n_obs), d_r (T, n_obs, 3), d_p (T, n_obs, 3), warm) in
        one fused set of group solves over the whole trajectory; gradients
        via the envelope theorem with (x*, z*) frozen
        (proximity_gradient.py:50-88)."""
        T = rs.shape[0]
        sols, new_warm = self._solve_groups_traj(rs, ps, obs_r, obs_p, warm,
                                                 skip=skip, margin=margin)
        xs = tuple(jax.lax.stop_gradient(s.x).reshape(T, -1, s.x.shape[-1])
                   for s in sols)
        zs = tuple(jax.lax.stop_gradient(s.z).reshape(T, -1, s.z.shape[-1])
                   for s in sols)
        d_r, d_p = self._envelope_grads(rs, ps, obs_r, obs_p, xs, zs)
        alphas = self._gather_cols([x[..., 3] for x in xs], T)
        return alphas, d_r, d_p, new_warm

    def _envelope_grads(self, rs, ps, obs_r, obs_p, xs, zs):
        """d alpha / d(r, p) per (knot, obstacle) with (x, z) frozen
        (proximity_gradient.py:50-88).  FORWARD-mode over the 6 pose dims:
        the per-pair Lagrangian is scalar but shares one assembly across all
        obstacles, so 6 JVP columns of the batched assembly beat n_obs
        reverse sweeps (measured 8 ms -> ~2 ms per iteration at batch 64).
        ``xs``/``zs``: per-group (T, n_g, nv_g)/(T, n_g, nr_g) tuples."""

        def lag_vec(r_, p_, xs_, zs_):
            grouped = self.assemble_groups(r_, p_, obs_r, obs_p)
            lags = []
            for gi in range(len(grouped)):
                _, G_, h_ = grouped[gi]
                # elementwise Gx (nv <= 6 contraction): avoid the padded-MXU
                # small-dot path under jacfwd
                Gx_ = jnp.sum(G_ * xs_[gi][..., None, :], axis=-1)
                lags.append(jnp.sum(zs_[gi] * (Gx_ - h_), axis=-1))
            return jnp.concatenate(lags)[jnp.asarray(self.inv_perm)]

        return jax.vmap(jax.jacfwd(lag_vec, argnums=(0, 1)))(rs, ps, xs, zs)

    def alphas_and_grads(self, r, p, obs_r, obs_p):
        """Single-pose variant of :meth:`alphas_and_grads_traj`."""
        a, d_r, d_p, _ = self.alphas_and_grads_traj(
            r[None], p[None], obs_r, obs_p)
        return a[0], d_r[0], d_p[0]

    def alphas_and_grads_from_solution(self, rs, ps, obs_r, obs_p, sol):
        """Envelope gradients from an ALREADY-CONVERGED solver state for the
        SAME poses (no PDIP solve): ``sol`` = per-group (x, s, z) tuple over
        flat (T*n_g,) batches.  Used by the backward pass, which evaluates at
        exactly the trajectory the accepted forward candidate solved."""
        T = rs.shape[0]
        xs = tuple(jax.lax.stop_gradient(x).reshape(T, -1, x.shape[-1])
                   for (x, _, _) in sol)
        zs = tuple(jax.lax.stop_gradient(z).reshape(T, -1, z.shape[-1])
                   for (_, _, z) in sol)
        d_r, d_p = self._envelope_grads(rs, ps, obs_r, obs_p, xs, zs)
        alphas = self._gather_cols([x[..., 3] for x in xs], T)
        return alphas, d_r, d_p


@dataclasses.dataclass(frozen=True)
class System:
    """Static system description.  Subclasses define dynamics and the robot
    pose extraction; control bounds and collision constraints are shared.

    ``fd_jacobians``: use the reference's forward-difference dynamics
    Jacobians (delta=1e-6, ALTRO.py:77-100) instead of exact AD.  Exact AD is
    the default (better conditioned); FD mode reproduces the reference's
    iterate path on nonlinear systems for bit-similar trajectory parity."""

    nx: int
    nu: int
    N: int
    dt: float
    scene: CollisionScene
    fd_jacobians: bool = False
    fd_delta: float = 1e-6

    @property
    def ncx(self) -> int:
        return self.scene.n_obs

    @property
    def ncu(self) -> int:
        return 2 * self.nu

    # -- dynamics ---------------------------------------------------------
    def dynamics(self, params, x, u, k):
        raise NotImplementedError

    def discrete_dynamics(self, params, x, u, k):
        """RK4, matching the reference integrator exactly
        (e.g. systems/piano_mover.py:28-47)."""
        dt = self.dt
        k1 = dt * self.dynamics(params, x, u, k)
        k2 = dt * self.dynamics(params, x + 0.5 * k1, u, k)
        k3 = dt * self.dynamics(params, x + 0.5 * k2, u, k)
        k4 = dt * self.dynamics(params, x + k3, u, k)
        return x + (k1 + 2 * k2 + 2 * k3 + k4) / 6.0

    def dynamics_jacobians(self, params, x, u, k):
        """A, B: exact forward-mode AD by default; forward differences in
        reference-compatible mode (ALTRO.py:77-100)."""
        f = lambda x_, u_: self.discrete_dynamics(params, x_, u_, k)
        if not self.fd_jacobians:
            return jax.jacfwd(f, argnums=(0, 1))(x, u)
        d = jnp.asarray(self.fd_delta, x.dtype)
        f0 = f(x, u)
        A = jax.vmap(lambda e: (f(x + d * e, u) - f0) / d)(
            jnp.eye(self.nx, dtype=x.dtype)).T
        B = jax.vmap(lambda e: (f(x, u + d * e) - f0) / d)(
            jnp.eye(self.nu, dtype=x.dtype)).T
        return A, B

    # -- robot pose from state -------------------------------------------
    def robot_pose(self, x):
        """(r, p) of the robot primitive for state x."""
        raise NotImplementedError

    def pose_jacobian_rows(self, x, d_r, d_p):
        """Map per-obstacle pose gradients to constraint-Jacobian rows
        d(1 - alpha)/dx, shape (n_obs, nx)."""
        raise NotImplementedError

    # -- state inequality constraints: h = 1 - alpha ---------------------
    def constraints_x(self, params, x):
        r, p = self.robot_pose(x)
        return 1.0 - self.scene.alphas(r, p, params["obs_r"], params["obs_p"])

    def constraints_x_traj(self, params, X, warm=None, skip=None):
        """((T, ncx) constraint values, solver warm state) for a state
        trajectory, as one flat batched PDIP solve.  ``skip``: scalar bool
        marking this member's results as discarded (lock-step line search)."""
        rs, ps = jax.vmap(self.robot_pose)(X)
        a, new_warm = self.scene.alphas_traj(
            rs, ps, params["obs_r"], params["obs_p"], warm=warm, skip=skip)
        return 1.0 - a, new_warm

    def constraints_x_vg(self, params, x):
        """(h (ncx,), dh/dx (ncx, nx)) in one fused solve."""
        r, p = self.robot_pose(x)
        a, d_r, d_p = self.scene.alphas_and_grads(
            r, p, params["obs_r"], params["obs_p"])
        return 1.0 - a, self.pose_jacobian_rows(x, d_r, d_p)

    def constraints_x_vg_traj(self, params, X, warm=None, skip=None):
        """(h (T, ncx), dh/dx (T, ncx, nx), warm) for a state trajectory in
        one fused batched solve.  This is the backward pass's POLISH path:
        with a warm start (the accepted candidate's converged solution at
        exactly this X) the re-solve uses the smaller ``polish_margin``."""
        rs, ps = jax.vmap(self.robot_pose)(X)
        margin = self.scene.opts.polish_margin if warm is not None else None
        a, d_r, d_p, new_warm = self.scene.alphas_and_grads_traj(
            rs, ps, params["obs_r"], params["obs_p"], warm=warm, skip=skip,
            margin=margin)
        rows = jax.vmap(self.pose_jacobian_rows)(X, d_r, d_p)
        return 1.0 - a, rows, new_warm

    def constraints_x_vg_from_solution(self, params, X, sol):
        """(h, dh/dx) from an already-converged solution at X — no solve."""
        rs, ps = jax.vmap(self.robot_pose)(X)
        a, d_r, d_p = self.scene.alphas_and_grads_from_solution(
            rs, ps, params["obs_r"], params["obs_p"], sol)
        rows = jax.vmap(self.pose_jacobian_rows)(X, d_r, d_p)
        return 1.0 - a, rows

    # -- control bounds ---------------------------------------------------
    def constraints_u(self, params, u):
        """[u - u_max; u_min - u] (e.g. piano_mover.py:99-112)."""
        return jnp.concatenate([u - params["u_max"], params["u_min"] - u])

    def constraints_u_grad(self, params, u):
        eye = jnp.eye(self.nu, dtype=u.dtype)
        return jnp.concatenate([eye, -eye], axis=0)


def full_pose_jacobian_rows(nx: int, d_r, d_p):
    """Rows [-d_r, 0_3, -d_p, 0_3] for systems with state [r;v;p;w]
    (quadrotor/cone, cf. cluttered_hallway_quadrotor.py:159-171)."""
    n_obs = d_r.shape[0]
    zeros = jnp.zeros((n_obs, 3), dtype=d_r.dtype)
    J = jnp.concatenate([-d_r, zeros, -d_p, zeros], axis=1)
    assert J.shape[1] == nx
    return J
