"""Differentiable proximity (DCOL alpha) between two convex primitives.

``alpha`` is the minimum uniform scaling of both primitives at which they
intersect; ``alpha < 1`` means collision.  Forward pass = one padded conic LP
(:mod:`dcol_tpu.ops.pdip`), mirroring ``proximity/proximity.py:6-53``.

Gradient = the envelope/KKT-sensitivity result used by the reference
(``proximity/proximity_gradient.py:50-88``):

    d alpha / d theta = d/d theta [ z*' (G(theta) x* - h(theta)) ]

with the optimal primal/dual pair (x*, z*) frozen.  The reference evaluates
this with 13 finite-difference re-assemblies; here it is one ``jax.grad`` of
the (tiny, closed-form) assembly — exact, fused, and batchable.  Padding rows
(see assembly.py) have zero dual weight at the optimum and constant G/h, so
they drop out of the gradient automatically.

``proximity_alpha`` additionally exposes alpha as a first-class
``custom_vjp``-differentiable function so downstream code can simply
``jax.grad`` through collision constraints.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dcol_tpu.geometry import assembly
from dcol_tpu.geometry.primitives import Shape
from dcol_tpu.ops.cones import ConeLayout
from dcol_tpu.ops.pdip import solve_socp


class ProximityResult(NamedTuple):
    alpha: jnp.ndarray          # (...,) scaling-to-contact; <1 means collision
    contact: jnp.ndarray        # (..., 3) contact point
    x: jnp.ndarray              # (..., nv) primal solution
    z: jnp.ndarray              # (..., nr) dual solution
    converged: jnp.ndarray      # (...,) bool
    iters: jnp.ndarray          # (...,) int32


def pair_layouts(s1: Shape, s2: Shape):
    """(PairLayout, ConeLayout) for a standalone pair: the EXACT minimal
    layout (zero padding rows; absent SOC blocks dropped — a polytope pair
    solves as a pure-orthant LP)."""
    pl = assembly.exact_layout(s1, s2)
    cl = ConeLayout(pl.n_ort, pl.s1, pl.s2)
    return pl, cl


def proximity(s1: Shape, s2: Shape, r1, p1, r2, p2, *, layouts=None,
              tol: float = 1e-6, max_iters: int = 30,
              jitter: float = 0.0) -> ProximityResult:
    """Proximity between two posed primitives.  Poses may carry leading batch
    dims (all four broadcast together)."""
    pl, cl = layouts if layouts is not None else pair_layouts(s1, s2)
    if jnp.ndim(r1) > 1:  # auto-vmap over leading batch dims (assembly is scalar)
        return jax.vmap(
            lambda a, b, c_, d: proximity(s1, s2, a, b, c_, d,
                                          layouts=(pl, cl), tol=tol,
                                          max_iters=max_iters, jitter=jitter)
        )(r1, p1, r2, p2)
    c, G, h = assembly.assemble_pair(s1, s2, pl, r1, p1, r2, p2)
    sol = solve_socp(c, G, h, cl, tol=tol, max_iters=max_iters, jitter=jitter)
    return ProximityResult(sol.x[..., 3], sol.x[..., :3], sol.x, sol.z,
                           sol.converged, sol.iters)


def envelope_gradient(s1: Shape, s2: Shape, pl, x, z, r1, p1, r2, p2,
                      argnums=(0, 1, 2, 3)):
    """d alpha / d(poses) with (x, z) frozen at the optimum.

    Returns a tuple of gradients matching ``argnums`` over (r1, p1, r2, p2).
    """
    x = jax.lax.stop_gradient(x)
    z = jax.lax.stop_gradient(z)

    def lagrangian(r1_, p1_, r2_, p2_):
        _, G, h = assembly.assemble_pair(s1, s2, pl, r1_, p1_, r2_, p2_)
        # elementwise Gx (contraction dim nv <= 6): keeps the tiny dot (and
        # its AD transpose) off XLA:TPU's padded-MXU path
        Gx = jnp.sum(G * x[..., None, :], axis=-1)
        return jnp.sum(z * (Gx - h), axis=-1)

    grads = jax.grad(lambda *a: jnp.sum(lagrangian(*a)), argnums=argnums)
    return grads(r1, p1, r2, p2)


def proximity_with_grad(s1: Shape, s2: Shape, r1, p1, r2, p2, *, layouts=None,
                        argnums=(0, 1), tol: float = 1e-6,
                        max_iters: int = 30, jitter: float = 0.0):
    """One solve returning alpha AND its pose gradients — fuses the
    reference's separate value/gradient solve pair
    (``inequality_constraints_x`` vs ``_x_grad``; SURVEY.md §7.4 item 5)."""
    pl, cl = layouts if layouts is not None else pair_layouts(s1, s2)
    res = proximity(s1, s2, r1, p1, r2, p2, layouts=(pl, cl), tol=tol,
                    max_iters=max_iters, jitter=jitter)
    grads = envelope_gradient(s1, s2, pl, res.x, res.z, r1, p1, r2, p2,
                              argnums=argnums)
    return res, grads


# ---------------------------------------------------------------------------
# alpha as a custom_vjp-differentiable scalar
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _alpha_cvjp(s1, s2, opts, r1, p1, r2, p2):
    layouts, tol, max_iters, jitter = opts
    return proximity(s1, s2, r1, p1, r2, p2, layouts=layouts, tol=tol,
                     max_iters=max_iters, jitter=jitter).alpha


def _alpha_fwd(s1, s2, opts, r1, p1, r2, p2):
    layouts, tol, max_iters, jitter = opts
    res = proximity(s1, s2, r1, p1, r2, p2, layouts=layouts, tol=tol,
                    max_iters=max_iters, jitter=jitter)
    return res.alpha, (res.x, res.z, r1, p1, r2, p2)


def _alpha_bwd(s1, s2, opts, residuals, ct):
    layouts, _, _, _ = opts
    pl = layouts[0]
    x, z, r1, p1, r2, p2 = residuals
    g1, g2, g3, g4 = envelope_gradient(s1, s2, pl, x, z, r1, p1, r2, p2,
                                       argnums=(0, 1, 2, 3))
    ct_ = ct[..., None] if g1.ndim > 1 else ct
    return (ct_ * g1, ct_ * g2, ct_ * g3, ct_ * g4)


_alpha_cvjp.defvjp(_alpha_fwd, _alpha_bwd)


def proximity_alpha(s1: Shape, s2: Shape, r1, p1, r2, p2, *, layouts=None,
                    tol: float = 1e-6, max_iters: int = 30,
                    jitter: float = 0.0):
    """alpha(s1@(r1,p1), s2@(r2,p2)) differentiable w.r.t. all four poses via
    the envelope theorem (API analogue of DCOL.jl's proximity_gradient)."""
    if layouts is None:
        layouts = pair_layouts(s1, s2)
    opts = (layouts, tol, max_iters, jitter)
    return _alpha_cvjp(s1, s2, opts, r1, p1, r2, p2)
