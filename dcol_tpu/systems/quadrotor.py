"""Cluttered-hallway quadrotor: 6-DOF quadrotor (MRP attitude) flying through
11 heterogeneous obstacles.  Mirrors ``systems/cluttered_hallway_quadrotor.py``
(dynamics :19-105, constraints :107-188, initialisation :227-387) with exact
hyperparameters, obstacle poses, and the pinned Julia-seed-2 initial controls.

State x = [r(3); v(3); p(3, MRP); omega(3)]; control u = rotor speeds (4).
Note the README's "12 objects" claim vs the code's 11 obstacles (ncx=11);
we follow the code (SURVEY.md §7.5).
"""

from __future__ import annotations

import dataclasses
import os

import jax.numpy as jnp
import numpy as np

from dcol_tpu.geometry import primitives as prim
from dcol_tpu.geometry.mrp import dcm_from_mrp, mrp_kinematics
from dcol_tpu.solver.altro import AltroConfig
from dcol_tpu.systems.base import (
    CollisionScene, ProximityOptions, System, full_pose_jacobian_rows)

_DATA = os.path.join(os.path.dirname(__file__), "data", "fixtures.npz")

MASS = 0.5
J_INERTIA = np.diag([0.0023, 0.0023, 0.004])
J_DIAG = np.array([0.0023, 0.0023, 0.004])
GRAVITY = 9.81
ARM_L = 0.1750
KF = 1.0
KM = 0.0245


@dataclasses.dataclass(frozen=True)
class Quadrotor(System):
    def dynamics(self, params, x, u, k):
        dt = x.dtype
        v = x[3:6]
        p = x[6:9]
        omega = x[9:12]
        Q = dcm_from_mrp(p)
        Jd = jnp.asarray(J_DIAG, dt)

        # rotor forces clamp to >= 0 (reference :53-56); kink-differentiable
        F_rot = jnp.maximum(0.0, KF * u)
        M = KM * u
        tau = jnp.stack([
            ARM_L * (F_rot[1] - F_rot[3]),
            ARM_L * (F_rot[2] - F_rot[0]),
            M[0] - M[1] + M[2] - M[3],
        ])
        # body thrust is along e3, so Q @ F_body == Q[:, 2] * |F| — keep the
        # tiny matvec off XLA:TPU's padded-MXU dot path (hot under jacfwd)
        f_world = (MASS * jnp.array([0.0, 0.0, -GRAVITY], dt)
                   + Q[:, 2] * jnp.sum(F_rot))
        # inertia is diagonal: solve(J, .) is an elementwise divide (avoids
        # XLA:TPU's small-matrix LU path, which is both slow and inaccurate)
        omega_dot = (tau - jnp.cross(omega, Jd * omega)) / Jd
        return jnp.concatenate(
            [v, f_world / MASS, mrp_kinematics(p, omega), omega_dot])

    def robot_pose(self, x):
        return x[0:3], x[6:9]

    def pose_jacobian_rows(self, x, d_r, d_p):
        return full_pose_jacobian_rows(self.nx, d_r, d_p)


def linear_interp_ref(dt, x0, xg, N):
    """Position/attitude linear interpolation reference trajectory
    (reference :192-225): constant velocity delta_p/((N-1)dt), zero angular
    velocity."""
    t = np.arange(N)[:, None] / (N - 1)
    positions = x0[0:3] + t * (xg[0:3] - x0[0:3])
    attitudes = x0[6:9] + t * (xg[6:9] - x0[6:9])
    velocity = np.tile((xg[0:3] - x0[0:3]) / ((N - 1) * dt), (N, 1))
    omega = np.zeros((N, 3))
    return np.concatenate([positions, velocity, attitudes, omega], axis=1)


def make_system(pdip_tol: float = 1e-6, pdip_iters: int = 30,
                backend: str = "xla",
                pdip_jitter: float = 0.0, N: int = 100,
                dt: float = 0.08, fd_jacobians: bool = False,
                merge_groups: bool = False) -> Quadrotor:
    data = np.load(_DATA)
    A_poly, b_poly = prim.n_sided_polygon(5, 0.6)
    obstacles = (
        prim.cylinder(0.6, 3.0),
        prim.capsule(0.2, 5.0),
        prim.sphere(0.8),
        prim.cone(2.0, np.deg2rad(22)),
        prim.polytope(data["A2"].T, data["b2"]),
        prim.polygon(A_poly, b_poly, 0.2),
        prim.cylinder(1.1, 2.3),
        prim.capsule(0.8, 1.0),
        prim.sphere(0.5),
        prim.rect_prism(20.0, 5.0, 0.2),   # floor
        prim.rect_prism(20.0, 5.0, 0.2),   # ceiling
    )
    scene = CollisionScene(
        prim.sphere(0.25), obstacles,
        ProximityOptions(pdip_tol, pdip_iters, pdip_jitter, backend,
                         merge_groups=merge_groups))
    return Quadrotor(nx=12, nu=4, N=N, dt=dt, scene=scene,
                     fd_jacobians=fd_jacobians)


# reference :314-331 (Julia-seed-2 obstacle poses), plus floor/ceiling rows
OBS_R = np.array([
    [-5.0, -0.3597289068234817, 4.087208492428585],
    [-3.75, 2.0547630560640364, 3.3248927294469155],
    [-2.5, 0.01357380155160959, 3.1056516058837307],
    [-1.25, 0.1520302408349855, 2.100626290031169],
    [0.0, 0.27038613194550204, 4.579317307027433],
    [1.25, -0.20563037602802728, 3.7707031750912097],
    [2.5, 1.724189934074888, 3.1527083547286816],
    [3.75, -0.7885513165549604, 2.3533371368422706],
    [5.0, 0.32074771862886275, 4.251199978479224],
    [0.0, 0.0, 0.9],
    [0.0, 0.0, 6.0],
])
OBS_P = np.array([
    [0.9743462834661368, 0.5695654691654629, -0.929297065594203],
    [0.44432216225861665, -0.8131633664490159, 0.8533462452863487],
    [-0.7818142467739891, -1.0606493186561021, -0.6997594248738506],
    [0.09970204047057568, -0.6590733218999884, 0.10747184882042882],
    [-1.178486073522902, -0.5852806292416908, -0.5104503832374265],
    [1.322242556684692, 1.477962368008582, -0.09186250030835676],
    [-1.670756785490579, -1.6504683581003534, 0.9958143390876766],
    [0.40980738483268503, 0.5108420391824778, 0.42272633604120335],
    [1.8822143307659809, -0.7779808480817001, 0.8308676764061569],
    [0.0, 0.0, 0.0],
    [0.0, 0.0, 0.0],
])


def make_problem(dtype=jnp.float64, N: int = 100, backend: str = "auto",
                 merge_groups: bool = False):
    """(system, params, X0, U0, config); reference :234-246, :255-262.
    ``merge_groups``: latency mode — one merged padded kernel launch per
    constraint batch instead of one per obstacle kind (see
    ProximityOptions.merge_groups)."""
    if backend == "auto":
        import jax
        backend = "pallas" if jax.default_backend() != "cpu" else "xla"
    if jnp.dtype(dtype) == jnp.float32:  # f32 PDIP conditioning
        sys = make_system(N=N, pdip_tol=2e-5, pdip_jitter=1e-6, backend=backend,
                          merge_groups=merge_groups)
    else:
        sys = make_system(N=N, backend=backend, merge_groups=merge_groups)
    nx, nu = sys.nx, sys.nu
    x0 = np.array([-8, 0, 4, 0, 0, 0.0, 0, 0, 0, 0, 0, 0])
    xg = np.array([8, 0, 4, 0, 0, 0.0, 0, 0, 0, 0, 0, 0])
    params = {
        "Q": jnp.eye(nx, dtype=dtype),
        "R": jnp.eye(nu, dtype=dtype),
        "Qf": jnp.eye(nx, dtype=dtype),
        "Xref": jnp.asarray(linear_interp_ref(sys.dt, x0, xg, N), dtype),
        "Uref": jnp.full((N - 1, nu), GRAVITY * MASS / 4.0, dtype),
        "u_min": jnp.full((nu,), -2000.0, dtype),
        "u_max": jnp.full((nu,), 2000.0, dtype),
        "obs_r": jnp.asarray(OBS_R, dtype),
        "obs_p": jnp.asarray(OBS_P, dtype),
    }
    ls_slack = 1e-4 if jnp.dtype(dtype) == jnp.float32 else 0.0
    cfg = AltroConfig(ls_slack=ls_slack, max_iters=3000, max_ls_iters=20, atol=1e-2,
                      convio_tol=1e-4, rho0=1.0, phi=10.0,
                      reg_min=1e-6, reg_max=1e2)
    X0 = jnp.asarray(np.tile(x0, (N, 1)), dtype)
    U0 = jnp.asarray(np.load(_DATA)["quadrotor_U0"][: N - 1], dtype)
    return sys, params, X0, U0, cfg
