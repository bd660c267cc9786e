"""Piano-mover system: a 2-D double-integrator line segment threading three
wall polytopes.  Mirrors ``systems/piano_mover.py`` in the reference
(dynamics :7-25, constraints :49-127, initialisation :130-233) with the exact
hyperparameters and the pinned Julia-seed-2 initial controls.

State x = [rx, ry, vx, vy, theta, omega]; control u = [ax, ay, 100*domega].
The robot's planar heading maps to the MRP p = [0, 0, tan(theta/4)]
(:61,85) with the manual chain rule dp/dtheta = e3 / (4 cos^2(theta/4)).
"""

from __future__ import annotations

import dataclasses
import os

import jax.numpy as jnp
import numpy as np

from dcol_tpu.geometry import primitives as prim
from dcol_tpu.solver.altro import AltroConfig
from dcol_tpu.systems.base import CollisionScene, ProximityOptions, System

_DATA = os.path.join(os.path.dirname(__file__), "data", "fixtures.npz")


@dataclasses.dataclass(frozen=True)
class PianoMover(System):
    def dynamics(self, params, x, u, k):
        v = x[2:4]
        omega = x[5:6]
        return jnp.concatenate([v, u[:2], omega, u[2:3] / 100.0])

    def robot_pose(self, x):
        r = jnp.concatenate([x[:2], jnp.zeros((1,), x.dtype)])
        p = jnp.array([0.0, 0.0, 1.0], x.dtype) * jnp.tan(x[4] / 4.0)
        return r, p

    def pose_jacobian_rows(self, x, d_r, d_p):
        """Rows of d(1-alpha)/dx with the theta->MRP chain rule
        (reference :70-97)."""
        n_obs = d_r.shape[0]
        dt = d_r.dtype
        dp_dtheta = 1.0 / (4.0 * jnp.cos(x[4] / 4.0) ** 2)
        z = jnp.zeros((n_obs, 1), dt)
        return jnp.concatenate(
            [-d_r[:, :2], z, z, (-d_p[:, 2] * dp_dtheta)[:, None], z], axis=1)


def make_system(pdip_tol: float = 1e-6, pdip_iters: int = 30,
                backend: str = "xla",
                pdip_jitter: float = 0.0, N: int = 80,
                dt: float = 0.1, fd_jacobians: bool = False) -> PianoMover:
    robot = prim.rect_prism(2.5, 0.15, 0.01)            # reference :168
    obstacles = (
        prim.rect_prism(3.0, 3.0, 1.0),
        prim.rect_prism(4.0, 1.0, 1.0),
        prim.rect_prism(1.0, 5.0, 1.1),
    )
    scene = CollisionScene(
        robot, obstacles,
        ProximityOptions(pdip_tol, pdip_iters, pdip_jitter, backend))
    return PianoMover(nx=6, nu=3, N=N, dt=dt, scene=scene,
                      fd_jacobians=fd_jacobians)


def make_problem(dtype=jnp.float64, N: int = 80, backend: str = "auto"):
    """(system, params, X0, U0, config) with reference hyperparameters
    (:137-219) and the pinned initial controls (:228)."""
    if backend == "auto":
        import jax
        backend = "pallas" if jax.default_backend() != "cpu" else "xla"
    if jnp.dtype(dtype) == jnp.float32:  # f32 PDIP conditioning
        sys = make_system(N=N, pdip_tol=2e-5, pdip_jitter=1e-6, backend=backend)
    else:
        sys = make_system(N=N, backend=backend)
    N, nx, nu = sys.N, sys.nx, sys.nu
    x0 = np.array([1.5, 1.5, 0, 0, 0, 0])
    xg = np.array([3.5, 3.7, 0, 0, np.deg2rad(90), 0])

    params = {
        "Q": jnp.eye(nx, dtype=dtype),
        "R": jnp.asarray(np.diag([1, 1, 0.001]), dtype),
        "Qf": jnp.eye(nx, dtype=dtype),
        "Xref": jnp.asarray(np.tile(xg, (N, 1)), dtype),
        "Uref": jnp.zeros((N - 1, nu), dtype),
        "u_min": jnp.full((nu,), -200.0, dtype),
        "u_max": jnp.full((nu,), 200.0, dtype),
        "obs_r": jnp.asarray(
            [[1.5, 3.5, 0.0], [2.0, 0.5, 0.0], [4.5, 2.5, 0.0]], dtype),
        "obs_p": jnp.zeros((3, 3), dtype),
    }
    ls_slack = 1e-4 if jnp.dtype(dtype) == jnp.float32 else 0.0
    cfg = AltroConfig(ls_slack=ls_slack, max_iters=3000, max_ls_iters=20, atol=4e-2,
                      convio_tol=1e-4, rho0=1.0, phi=10.0,
                      reg_min=1e-6, reg_max=1e2)
    X0 = jnp.asarray(np.tile(x0, (N, 1)), dtype)
    U0 = jnp.asarray(np.load(_DATA)["piano_U0"][: N - 1], dtype)
    return sys, params, X0, U0, cfg
