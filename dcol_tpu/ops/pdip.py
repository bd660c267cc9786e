"""Batched primal-dual interior-point solver for small conic LPs

    min  c'x   s.t.  G x + s = h,   s in K = R^n_+ x SOC(s1) x SOC(s2)

using Nesterov-Todd scaling and a Mehrotra predictor-corrector, with a
normal-equations Newton solve — the same algorithm as the reference
(``proximity/pdip.py:373-470``) re-designed for TPU:

  * **fixed shapes**: the cone layout is static; every pair type is padded to
    it (see :mod:`dcol_tpu.geometry.assembly`), so one compiled kernel serves
    the whole batch;
  * **fixed iteration count with convergence masking**: instead of the
    reference's data-dependent ``return``/``raise``, a ``lax.while_loop`` runs
    until every batch member's duality gap ``mu`` is below tolerance (or the
    iteration cap), freezing converged members — batch members never raise,
    they report a ``converged`` flag (SURVEY.md §5 failure-handling note);
  * **no factorization of the scaling**: SOC NT scalings invert in closed form
    (:mod:`dcol_tpu.ops.cones`), and the 1-2 small normal-equation Cholesky
    solves per iteration use the unrolled :mod:`dcol_tpu.ops.chol`;
  * everything broadcasts over arbitrary leading batch dims — ``vmap`` is
    unnecessary (but harmless).

Deviation from the reference (documented, SURVEY.md §7.5): the dual
initialisation uses the correct triangular solves; the reference's
``initialize`` calls ``solve_triangular`` without ``lower=True``
(``pdip.py:326-327``), yielding a wrong-but-recoverable start.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dcol_tpu.ops import chol
from dcol_tpu.ops.cones import (
    ConeLayout,
    bring2cone,
    cone_product,
    gen_e,
    inverse_cone_product,
    linesearch,
    nt_apply,
    nt_scalings,
    nt_solve,
    nt_solve_mat,
)


class SocpSolution(NamedTuple):
    x: jnp.ndarray          # (..., nv)
    s: jnp.ndarray          # (..., nr)
    z: jnp.ndarray          # (..., nr)
    iters: jnp.ndarray      # (...,) int32: iterations consumed
    converged: jnp.ndarray  # (...,) bool: mu < tol reached within the cap


def _mu(lay: ConeLayout, s, z):
    return jnp.sum(s * z, axis=-1) / lay.degree


def initialize(lay: ConeLayout, c, G, h, jitter):
    """Least-squares primal/dual start shifted into the cone
    (pdip.py:291-332, with the triangular-solve bug fixed)."""
    Gt = jnp.swapaxes(G, -1, -2)
    M = Gt @ G
    L = chol.chol_factor(M, jitter)
    x_hat = chol.chol_solve(L, jnp.einsum("...rv,...r->...v", G, h))
    s_hat = bring2cone(lay, jnp.einsum("...rv,...v->...r", G, x_hat) - h)
    x_dual = chol.chol_solve(L, -c)
    z_hat = bring2cone(lay, jnp.einsum("...rv,...v->...r", G, x_dual))
    return x_hat, s_hat, z_hat


def warm_initialize(lay: ConeLayout, x, s, z, margin: float = 1e-3):
    """Shift a previous optimum strictly back into the cone interior so it can
    seed a nearby solve.  Successive ALTRO iterations perturb poses slightly,
    so re-centred previous iterates cut PDIP iterations ~2x."""
    e = gen_e(lay, s.dtype)
    s_w = bring2cone(lay, s + margin * e)
    z_w = bring2cone(lay, z + margin * e)
    return x, s_w, z_w


@partial(jax.jit, static_argnames=("lay", "max_iters", "jitter",
                                   "warm_margin"))
def solve_socp(c, G, h, lay: ConeLayout, *, tol: float = 1e-6,
               max_iters: int = 30, jitter: float = 0.0,
               warm=None, skip=None,
               warm_margin: float = 1e-3) -> SocpSolution:
    """Solve a batch of conic LPs; leading dims of c/G/h are batch dims.
    ``warm``: optional (x, s, z) from a previous nearby solve.
    ``skip``: optional bool (broadcastable to the batch shape) marking
    members whose RESULT THE CALLER DISCARDS: they enter the loop already
    frozen (zero iterations, output = the initial/warm iterate).  Lock-step
    batched callers (the ALTRO line search) use this to make already-decided
    members free instead of re-solving work nobody reads."""
    dt = G.dtype
    if skip is not None and warm is None:
        raise ValueError(
            "skip= requires warm=: a skipped member's output is its entry "
            "iterate, which is only meaningful as a previous converged "
            "solution, not the cold least-squares initializer")
    if warm is not None:
        x, s, z = warm_initialize(lay, *warm, margin=warm_margin)
    else:
        x, s, z = initialize(lay, c, G, h, jitter)
    e = gen_e(lay, dt)
    batch_shape = G.shape[:-2]
    done0 = jnp.zeros(batch_shape, dtype=bool)
    if skip is not None:
        done0 = done0 | skip
    iters0 = jnp.zeros(batch_shape, dtype=jnp.int32)

    def body(carry):
        i, x, s, z, done, iters = carry
        W = nt_scalings(lay, s, z)
        lam = nt_apply(lay, W, z)
        lam_lam = cone_product(lay, lam, lam)
        Gt = jnp.swapaxes(G, -1, -2)
        rx = jnp.einsum("...vr,...r->...v", Gt, z) + c
        rz = s + jnp.einsum("...rv,...v->...r", G, x) - h
        mu = _mu(lay, s, z)
        new_done = done | (mu < tol) | ~jnp.isfinite(mu)

        G_tilde = nt_solve_mat(lay, W, G)
        M = jnp.einsum("...rv,...rw->...vw", G_tilde, G_tilde)
        L = chol.chol_factor(M, jitter)
        bx = -rx

        def newton(lam_ds):
            b_z = nt_solve(lay, W, -rz - nt_apply(lay, W, lam_ds))
            dx = chol.chol_solve(
                L, bx + jnp.einsum("...rv,...r->...v", G_tilde, b_z))
            dz = nt_solve(
                lay, W, jnp.einsum("...rv,...v->...r", G_tilde, dx) - b_z)
            ds = nt_apply(lay, W, lam_ds - nt_apply(lay, W, dz))
            return dx, ds, dz

        # affine (predictor) step
        dx_a, ds_a, dz_a = newton(inverse_cone_product(lay, lam, -lam_lam))
        a_aff = jnp.minimum(linesearch(lay, s, ds_a), linesearch(lay, z, dz_a))
        rho = (jnp.sum((s + a_aff[..., None] * ds_a)
                       * (z + a_aff[..., None] * dz_a), axis=-1)
               / jnp.sum(s * z, axis=-1))
        sigma = jnp.clip(rho, 0.0, 1.0) ** 3

        # centering + corrector step (pdip.py:450-460)
        ds_rhs = (-lam_lam
                  - cone_product(lay, nt_solve(lay, W, ds_a),
                                 nt_apply(lay, W, dz_a))
                  + (sigma * mu)[..., None] * e)
        dx_c, ds_c, dz_c = newton(inverse_cone_product(lay, lam, ds_rhs))
        a = jnp.minimum(
            1.0,
            0.99 * jnp.minimum(linesearch(lay, s, ds_c),
                               linesearch(lay, z, dz_c)),
        )

        # Candidate update, validated BEFORE applying: in f32 the normal
        # matrix can degenerate (cond ~1/eps near mu -> 0) and produce NaN
        # directions; such members freeze at their last good iterate instead
        # of being poisoned.  Freeze is via selection, NOT multiplication by
        # zero (0 * NaN = NaN).
        a_ = a[..., None]
        xn, sn, zn = x + a_ * dx_c, s + a_ * ds_c, z + a_ * dz_c
        good = (jnp.all(jnp.isfinite(xn), axis=-1)
                & jnp.all(jnp.isfinite(sn), axis=-1)
                & jnp.all(jnp.isfinite(zn), axis=-1))
        act = (~new_done & good)[..., None]
        x = jnp.where(act, xn, x)
        s = jnp.where(act, sn, s)
        z = jnp.where(act, zn, z)
        new_done = new_done | ~good  # numerical breakdown: permanent freeze
        iters = iters + jnp.where(act[..., 0], 1, 0).astype(jnp.int32)
        return i + 1, x, s, z, new_done, iters

    def cond(carry):
        i, _, _, _, done, _ = carry
        return (i < max_iters) & ~jnp.all(done)

    _, x, s, z, done, iters = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), x, s, z, done0, iters0))
    # final convergence check on the actual duality gap (members frozen by a
    # numerical breakdown above tol report converged=False but still carry
    # their last good iterate)
    mu_f = _mu(lay, s, z)
    converged = jnp.isfinite(mu_f) & (mu_f < tol)
    return SocpSolution(x, s, z, iters, converged)
