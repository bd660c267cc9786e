"""Cone-through-wall: a 6-DOF rigid-body cone steered (by a wrench) through
the square hole of a wall built from four rotated rectangular prisms.
Mirrors ``systems/cone_through_wall.py`` (dynamics :18-86, constraints
:88-172, initialisation :209-330) with exact hyperparameters and the
seed-2 numpy initial controls.

State x = [r(3); v(3); p(3, MRP); omega(3)]; control u = [f(3); tau(3)].
"""

from __future__ import annotations

import dataclasses
import os

import jax.numpy as jnp
import numpy as np

from dcol_tpu.geometry import primitives as prim
from dcol_tpu.geometry.mrp import mrp_from_quat, mrp_kinematics
from dcol_tpu.solver.altro import AltroConfig
from dcol_tpu.systems.base import (
    CollisionScene, ProximityOptions, System, full_pose_jacobian_rows)
from dcol_tpu.systems.quadrotor import linear_interp_ref

_DATA = os.path.join(os.path.dirname(__file__), "data", "fixtures.npz")

CONE_H = 2.0
CONE_BETA = np.deg2rad(22)
MASS, INERTIA = prim.cone_mass_properties(prim.cone(CONE_H, CONE_BETA))
MASS = float(MASS)  # python float: numpy-f64 scalars silently promote f32
                    # arrays when jax_enable_x64 is on
INERTIA_DIAG = np.diag(INERTIA).copy()


@dataclasses.dataclass(frozen=True)
class ConeThroughWall(System):
    def dynamics(self, params, x, u, k):
        dt = x.dtype
        v = x[3:6]
        p = x[6:9]
        omega = x[9:12]
        f = u[:3]
        tau = u[3:6]
        # diagonal inertia: elementwise solve (see quadrotor.py note)
        Jd = jnp.asarray(INERTIA_DIAG, dt)
        omega_dot = (tau - jnp.cross(omega, Jd * omega)) / Jd
        return jnp.concatenate(
            [v, f / MASS, mrp_kinematics(p, omega), omega_dot])

    def robot_pose(self, x):
        return x[0:3], x[6:9]

    def pose_jacobian_rows(self, x, d_r, d_p):
        return full_pose_jacobian_rows(self.nx, d_r, d_p)


def make_system(pdip_tol: float = 1e-6, pdip_iters: int = 30,
                backend: str = "xla",
                pdip_jitter: float = 0.0, N: int = 60,
                fd_jacobians: bool = False) -> ConeThroughWall:
    obstacles = (
        prim.rect_prism(10.0, 10.0, 1.0),
        prim.rect_prism(10.0, 10.0, 1.0),
        prim.rect_prism(4.1, 4.1, 1.1),
        prim.rect_prism(4.1, 4.1, 1.1),
    )
    scene = CollisionScene(
        prim.cone(CONE_H, CONE_BETA), obstacles,
        ProximityOptions(pdip_tol, pdip_iters, pdip_jitter, backend))
    return ConeThroughWall(nx=12, nu=6, N=N, dt=0.1, scene=scene,
                           fd_jacobians=fd_jacobians)


def make_problem(dtype=jnp.float64, N: int = 60, backend: str = "auto"):
    """(system, params, X0, U0, config); reference :214-246, :252-267.
    ``N`` defaults to the reference horizon; shorter horizons reuse the
    leading rows of the pinned seed-2 U0 fixture (API parity with
    piano_mover/quadrotor for MPC and dryrun use)."""
    if backend == "auto":
        import jax
        backend = "pallas" if jax.default_backend() != "cpu" else "xla"
    if jnp.dtype(dtype) == jnp.float32:
        # f32 PDIP conditioning: this system rides the convio_tol=1e-4
        # boundary in f32 (the AL endgame stalls at ~1e-4-level violations),
        # so envelope-gradient accuracy decides convergence.  2e-5 was
        # enough on CPU f32 but fails on TPU (different f32 rounding /
        # transcendental precision): nominal solve stalls at convio 7e-4 and
        # reg-caps.  1e-5 converges on both, in fewer iterations (49 on TPU)
        # — measured round 5, tol sweep {2e-5: fail, 1e-5: 49 it,
        # 5e-6: 77 it}.
        sys = make_system(N=N, pdip_tol=1e-5, pdip_jitter=1e-6,
                          backend=backend)
    else:
        sys = make_system(N=N, backend=backend)
    N, nx, nu = sys.N, sys.nx, sys.nu
    x0 = np.array([-4, -7, 9, 0.0, 0.0, 0.0, 0, 0, 0, 0, 0, 0])
    xg = np.array([-4.5, 7, 3, 0, 0, 0.0, 0.0, 0.0, 0.0, 0, 0, 0])
    # four wall slabs rotated 90 deg about x (reference :260-267)
    p_rot = np.asarray(mrp_from_quat(
        np.array([np.cos(np.pi / 4), np.sin(np.pi / 4), 0, 0])))
    obs_r = np.array([[-6, 0, 5.0], [6, 0, 5.0], [0, 0, 2.05], [0, 0, 7.96]])
    obs_p = np.tile(p_rot, (4, 1))
    params = {
        "Q": jnp.eye(nx, dtype=dtype),
        "R": jnp.asarray(np.diag([1.0, 1, 1, 100, 100, 100]), dtype),
        "Qf": jnp.eye(nx, dtype=dtype),
        "Xref": jnp.asarray(linear_interp_ref(sys.dt, x0, xg, N), dtype),
        "Uref": jnp.zeros((N - 1, nu), dtype),
        "u_min": jnp.full((nu,), -20.0, dtype),
        "u_max": jnp.full((nu,), 20.0, dtype),
        "obs_r": jnp.asarray(obs_r, dtype),
        "obs_p": jnp.asarray(obs_p, dtype),
    }
    ls_slack = 1e-4 if jnp.dtype(dtype) == jnp.float32 else 0.0
    cfg = AltroConfig(ls_slack=ls_slack, max_iters=3000, max_ls_iters=20, atol=1e-1,
                      convio_tol=1e-4, rho0=1.0, phi=10.0,
                      reg_min=1e-6, reg_max=1e2)
    X0 = jnp.asarray(np.tile(x0, (N, 1)), dtype)
    cone_U0 = np.load(_DATA)["cone_U0"]
    if N - 1 > cone_U0.shape[0]:
        raise ValueError(
            f"cone_through_wall N={N} exceeds the pinned seed-2 U0 fixture "
            f"horizon ({cone_U0.shape[0] + 1}); pass N <= "
            f"{cone_U0.shape[0] + 1}")
    U0 = jnp.asarray(cone_U0[: N - 1], dtype)
    return sys, params, X0, U0, cfg
