"""Modified Rodrigues Parameter (MRP) attitude math, in pure JAX.

The reference frames/conventions follow the DCOL formulation used by the
reference implementation (``/root/reference/primitives/problem_matrices.py:213``
``dcm_from_mrp``); here we use the equivalent compact closed form

    R(p) = I + (8 [p]x^2 + 4 (1 - p'p) [p]x) / (1 + p'p)^2

which matches the reference's expanded entries exactly (verified in
``tests/test_geometry.py`` against golden values).  Everything is traced JAX so the
rotation is differentiable w.r.t. ``p`` and batches under ``vmap``.
"""

from __future__ import annotations

import jax.numpy as jnp


def skew(w: jnp.ndarray) -> jnp.ndarray:
    """3x3 cross-product matrix [w]x such that [w]x v = w x v.

    Mirrors ``systems/cluttered_hallway_quadrotor.py:9`` in the reference.
    """
    wx, wy, wz = w[0], w[1], w[2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy]),
            jnp.stack([wz, z, -wx]),
            jnp.stack([-wy, wx, z]),
        ]
    )


def dcm_from_mrp(p: jnp.ndarray) -> jnp.ndarray:
    """Direction cosine matrix from an MRP vector (3,) -> (3, 3).

    Equivalent to the expanded form at ``primitives/problem_matrices.py:213-251``
    in the reference.  Uses the identity [p]x^2 = p p' - (p'p) I so the whole
    map is elementwise — a literal ``S @ S`` is a (3,3) dot_general, which
    XLA:TPU lowers to a padded MXU op inside the hot vmapped/jacfwd paths
    (the same pathology as the round-3 A-B-A chain finding).
    """
    pp = jnp.sum(p * p)
    S = skew(p)
    SS = p[:, None] * p[None, :] - pp * jnp.eye(3, dtype=p.dtype)
    den = (1.0 + pp) ** 2
    return jnp.eye(3, dtype=p.dtype) + (8.0 * SS + 4.0 * (1.0 - pp) * S) / den


def mrp_from_quat(q) -> jnp.ndarray:
    """Quaternion [w, x, y, z] -> MRP. Reference: ``systems/cone_through_wall.py:203``."""
    q = jnp.asarray(q)
    return q[1:4] / (1.0 + q[0])


def mrp_kinematics(p: jnp.ndarray, omega: jnp.ndarray) -> jnp.ndarray:
    """MRP attitude kinematics pdot = B(p) omega.

    B(p) = ((1 + p'p)/4) * (I + 2 ([p]x^2 + [p]x) / (1 + p'p)),
    matching ``systems/cluttered_hallway_quadrotor.py:72-74`` and
    ``systems/cone_through_wall.py:43-47``.

    B(p) omega is evaluated matrix-free ([p]x^2 w = p (p.w) - (p'p) w,
    [p]x w = p x w) so no (3,3) dot_general reaches XLA:TPU's padded-MXU
    small-matmul path in the vmapped rollout / jacfwd hot loops.
    """
    pp = jnp.sum(p * p)
    SSw = p * jnp.sum(p * omega) - pp * omega
    Sw = jnp.cross(p, omega)
    return ((1.0 + pp) / 4.0) * (omega + 2.0 * (SSw + Sw) / (1.0 + pp))
