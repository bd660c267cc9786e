"""Fused Pallas TPU kernel for the batched PDIP conic solver.

Same algorithm as :mod:`dcol_tpu.ops.pdip` (Mehrotra predictor-corrector with
NT scaling; see there for the reference mapping) but laid out for the TPU VPU:

  * **batch on lanes**: every quantity of the tiny (NR x NV) conic problem is
    stored problem-major with the scenario batch on the LAST axis — G is
    (NR, NV, BT), vectors are (rows, BT) — so each scalar of the algorithm is
    one (.., 128)-lane vector op over BT scenarios.  The XLA path's
    (B, NR, NV) layout pads NV=6..8 up to 128 lanes (>90% waste); this layout
    wastes nothing.
  * **everything unrolled at trace time**: the 8x8 normal-equation Cholesky,
    the triangular solves, and all cone-block algebra unroll into straight-
    line VPU code; the only loop is the interior-point iteration itself.
  * one ``pallas_call`` solves the whole batch: grid over batch tiles of
    ``BT`` lanes, all operands resident in VMEM (~100 KB/tile).

The wrapper :func:`solve_socp_pallas` accepts/returns the same (B, ...)
convention as ``solve_socp`` and is numerically interchangeable with it
(tested batch-vs-batch in ``tests/test_pdip_pallas.py``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dcol_tpu.ops.cones import ConeLayout
from dcol_tpu.ops.pdip import SocpSolution

_TINY = 1e-25


# ---------------------------------------------------------------------------
# axis-0 cone algebra (cone index first, batch last) — mirrors ops/cones.py
# ---------------------------------------------------------------------------

def _soc_quad(x):
    return x[0:1] ** 2 - jnp.sum(x[1:] ** 2, axis=0, keepdims=True)


def _soc_prod(u, v):
    head = jnp.sum(u * v, axis=0, keepdims=True)
    tail = u[0:1] * v[1:] + v[0:1] * u[1:]
    return jnp.concatenate([head, tail], axis=0)


def _soc_inv_prod(u, w):
    u0, u1 = u[0:1], u[1:]
    w0, w1 = w[0:1], w[1:]
    rho = _soc_quad(u)
    nu = jnp.sum(u1 * w1, axis=0, keepdims=True)
    head = u0 * w0 - nu
    tail = (nu / u0 - w0) * u1 + (rho / u0) * w1
    return jnp.concatenate([head, tail], axis=0) / rho


def _soc_nt(s, z):
    js = jnp.maximum(_soc_quad(s), _TINY)
    jz = jnp.maximum(_soc_quad(z), _TINY)
    sbar = s / jnp.sqrt(js)
    zbar = z / jnp.sqrt(jz)
    gamma = jnp.sqrt((1.0 + jnp.sum(sbar * zbar, axis=0, keepdims=True)) / 2.0)
    Jz = jnp.concatenate([zbar[0:1], -zbar[1:]], axis=0)
    wbar = (sbar + Jz) / (2.0 * gamma)
    eta = (js / jz) ** 0.25
    return eta, wbar  # (1, BT), (S, BT)


def _soc_apply(eta, wbar, v, inverse):
    """(eta Wbar)^{+/-1} v; v may carry extra middle dims (matrix blocks)."""
    extra = v.ndim - 2
    esh = (1,) + (1,) * extra + (eta.shape[-1],)
    wsh = (wbar.shape[0],) + (1,) * extra + (wbar.shape[-1],)
    eta = eta.reshape(esh)
    wbar = wbar.reshape(wsh)
    w0, w1 = wbar[0:1], wbar[1:]
    sgn = -1.0 if inverse else 1.0
    v0, v1 = v[0:1], v[1:]
    w1v1 = jnp.sum(w1 * v1, axis=0, keepdims=True)
    head = w0 * v0 + sgn * w1v1
    tail = v1 + (sgn * v0 + w1v1 / (1.0 + w0)) * w1
    out = jnp.concatenate([head, tail], axis=0)
    return out / eta if inverse else out * eta


def _matvec(G, x):
    """(NR, NV, BT) @ (NV, BT) -> (NR, BT)."""
    return jnp.sum(G * x[None], axis=1)


def _rmatvec(G, z):
    """G' z: (NR, NV, BT), (NR, BT) -> (NV, BT)."""
    return jnp.sum(G * z[:, None], axis=0)


def _make_ops(lay: ConeLayout):
    n, S1, S2 = lay.n_ort, lay.s1, lay.s2

    def split(v):
        return v[:n], v[n : n + S1], v[n + S1 :]

    def cone_prod(u, v):
        uo, u1, u2 = split(u)
        vo, v1, v2 = split(v)
        return jnp.concatenate(
            [uo * vo, _soc_prod(u1, v1), _soc_prod(u2, v2)], axis=0)

    def inv_cone_prod(lam, v):
        lo, l1, l2 = split(lam)
        vo, v1, v2 = split(v)
        return jnp.concatenate(
            [vo / lo, _soc_inv_prod(l1, v1), _soc_inv_prod(l2, v2)], axis=0)

    def nt(s, z):
        so, s1, s2 = split(s)
        zo, z1, z2 = split(z)
        return (jnp.sqrt(so / zo), _soc_nt(s1, z1), _soc_nt(s2, z2))

    def W_apply(W, v, inverse=False):
        w_ort, (e1, w1), (e2, w2) = W
        vo, v1, v2 = split(v)
        o = vo / w_ort if inverse else vo * w_ort
        return jnp.concatenate(
            [o, _soc_apply(e1, w1, v1, inverse),
             _soc_apply(e2, w2, v2, inverse)], axis=0)

    def W_solve_mat(W, G):
        w_ort, (e1, w1), (e2, w2) = W
        Go = G[:n] / w_ort[:, None]
        G1 = _soc_apply(e1, w1, G[n : n + S1], True)
        G2 = _soc_apply(e2, w2, G[n + S1 :], True)
        return jnp.concatenate([Go, G1, G2], axis=0)

    def linesearch(x, dx):
        xo, x1, x2 = split(x)
        do, d1, d2 = split(dx)
        neg = do < 0
        ratios = jnp.where(neg, -xo / jnp.where(neg, do, -1.0), jnp.inf)
        a = jnp.minimum(1.0, jnp.min(ratios, axis=0, keepdims=True))

        def soc_ls(y, d):
            y0, yv = y[0:1], y[1:]
            d0, dv = d[0:1], d[1:]
            nu = jnp.maximum(_soc_quad(y), _TINY)
            sq = jnp.sqrt(nu)
            zeta = y0 * d0 - jnp.sum(yv * dv, axis=0, keepdims=True)
            rho0 = zeta / nu
            coef = (zeta / sq + d0) / (y0 / sq + 1.0)
            rv = dv / sq - coef * yv / nu
            rnorm = jnp.sqrt(jnp.sum(rv * rv, axis=0, keepdims=True))
            lim = 1.0 / jnp.maximum(rnorm - rho0, _TINY)
            return jnp.where(rnorm > rho0, jnp.minimum(1.0, lim), 1.0)

        a = jnp.minimum(a, soc_ls(x1, d1))
        a = jnp.minimum(a, soc_ls(x2, d2))
        return a  # (1, BT)

    def bring2cone(r, e):
        ro, r1, r2 = split(r)
        a = -jnp.min(ro, axis=0, keepdims=True)
        a = jnp.maximum(
            a, -(r1[0:1] - jnp.sqrt(jnp.sum(r1[1:] ** 2, axis=0, keepdims=True))))
        a = jnp.maximum(
            a, -(r2[0:1] - jnp.sqrt(jnp.sum(r2[1:] ** 2, axis=0, keepdims=True))))
        return jnp.where(a < 0, r, r + (1.0 + a) * e)

    return split, cone_prod, inv_cone_prod, nt, W_apply, W_solve_mat, \
        linesearch, bring2cone


def _chol_factor(M, nv, jitter):
    """Unrolled Cholesky of M[(i,j)] -> dict of (1, BT) entries."""
    if jitter:
        tr = sum(M[(i, i)] for i in range(nv)) / nv
        M = {k: (v + jitter * tr if k[0] == k[1] else v) for k, v in M.items()}
    L = {}
    for i in range(nv):
        for j in range(i + 1):
            sacc = M[(i, j)] if i >= j else M[(j, i)]
            for k in range(j):
                sacc = sacc - L[(i, k)] * L[(j, k)]
            if i == j:
                L[(i, j)] = jnp.sqrt(sacc)
            else:
                L[(i, j)] = sacc / L[(j, j)]
    return L


def _chol_solve(L, b, nv):
    """b: (NV, BT) -> (NV, BT), unrolled forward/backward substitution."""
    y = [None] * nv
    for i in range(nv):
        sacc = b[i : i + 1]
        for k in range(i):
            sacc = sacc - L[(i, k)] * y[k]
        y[i] = sacc / L[(i, i)]
    x = [None] * nv
    for i in reversed(range(nv)):
        sacc = y[i]
        for k in range(i + 1, nv):
            sacc = sacc - L[(k, i)] * x[k]
        x[i] = sacc / L[(i, i)]
    return jnp.concatenate(x, axis=0)


def _make_kernel(lay: ConeLayout, nv: int, tol: float, max_iters: int,
                 jitter: float):
    nr = lay.nr
    n = lay.n_ort
    degree = lay.degree
    (split, cone_prod, inv_cone_prod, nt, W_apply, W_solve_mat,
     linesearch, bring2cone) = _make_ops(lay)

    def gram(G):
        """G' G as a dict of (1, BT) entries (upper triangle)."""
        return {(i, j): jnp.sum(G[:, i] * G[:, j], axis=0, keepdims=True)
                for i in range(nv) for j in range(i + 1)}

    def kernel(G_ref, h_ref, c_ref, x_ref, s_ref, z_ref, mu_ref, it_ref):
        G = G_ref[:]                      # (NR, NV, BT)
        h = h_ref[:]                      # (NR, BT)
        c = c_ref[:]                      # (NV, BT)
        BT = G.shape[-1]
        dt = G.dtype

        # cone identity [1]*n_ort + e1 per SOC, built without scatter
        # (Mosaic has no scatter lowering)
        def blk(k, dim):
            one = jnp.ones((1, BT), dt)
            zero = jnp.zeros((dim - 1, BT), dt)
            return jnp.concatenate([one, zero], axis=0)

        e = jnp.concatenate(
            [jnp.ones((n, BT), dt), blk(1, lay.s1), blk(2, lay.s2)], axis=0)

        # --- initialization (pdip.py initialize) -------------------------
        L0 = _chol_factor(gram(G), nv, jitter)
        x = _chol_solve(L0, _rmatvec(G, h), nv)
        s = bring2cone(_matvec(G, x) - h, e)
        xd = _chol_solve(L0, -c, nv)
        z = bring2cone(_matvec(G, xd), e)

        done = jnp.zeros((1, BT), dtype=jnp.bool_)
        iters = jnp.zeros((1, BT), dtype=jnp.float32)

        def body(_, carry):
            x, s, z, done, iters = carry
            W = nt(s, z)
            lam = W_apply(W, z)
            lam_lam = cone_prod(lam, lam)
            rx = _rmatvec(G, z) + c
            rz = s + _matvec(G, x) - h
            mu = jnp.sum(s * z, axis=0, keepdims=True) / degree
            new_done = done | (mu < tol) | ~(mu == mu)  # NaN-safe

            Gt = W_solve_mat(W, G)
            L = _chol_factor(gram(Gt), nv, jitter)
            bx = -rx

            def newton(lam_ds):
                b_z = W_apply(W, -rz - W_apply(W, lam_ds), inverse=True)
                dx = _chol_solve(L, bx + _rmatvec(Gt, b_z), nv)
                dz = W_apply(W, _matvec(Gt, dx) - b_z, inverse=True)
                ds = W_apply(W, lam_ds - W_apply(W, dz))
                return dx, ds, dz

            dx_a, ds_a, dz_a = newton(inv_cone_prod(lam, -lam_lam))
            a_aff = jnp.minimum(linesearch(s, ds_a), linesearch(z, dz_a))
            rho = (jnp.sum((s + a_aff * ds_a) * (z + a_aff * dz_a), axis=0,
                           keepdims=True)
                   / jnp.sum(s * z, axis=0, keepdims=True))
            sigma = jnp.clip(rho, 0.0, 1.0) ** 3

            ds_rhs = (-lam_lam
                      - cone_prod(W_apply(W, ds_a, inverse=True),
                                  W_apply(W, dz_a))
                      + (sigma * mu) * e)
            dx_c, ds_c, dz_c = newton(inv_cone_prod(lam, ds_rhs))
            a = jnp.minimum(
                1.0, 0.99 * jnp.minimum(linesearch(s, ds_c),
                                        linesearch(z, dz_c)))

            xn, sn, zn = x + a * dx_c, s + a * ds_c, z + a * dz_c
            good = (jnp.all(jnp.isfinite(xn), axis=0, keepdims=True)
                    & jnp.all(jnp.isfinite(sn), axis=0, keepdims=True)
                    & jnp.all(jnp.isfinite(zn), axis=0, keepdims=True))
            act = ~new_done & good
            x = jnp.where(act, xn, x)
            s = jnp.where(act, sn, s)
            z = jnp.where(act, zn, z)
            new_done = new_done | ~good
            iters = iters + jnp.where(act, 1.0, 0.0)
            return x, s, z, new_done, iters

        x, s, z, done, iters = jax.lax.fori_loop(
            0, max_iters, body, (x, s, z, done, iters))

        x_ref[:] = x
        s_ref[:] = s
        z_ref[:] = z
        mu_ref[:] = jnp.sum(s * z, axis=0, keepdims=True) / degree
        it_ref[:] = iters

    return kernel


@partial(jax.jit, static_argnames=("lay", "tol", "max_iters", "jitter",
                                   "block", "interpret"))
def solve_socp_pallas(c, G, h, lay: ConeLayout, *, tol: float = 1e-6,
                      max_iters: int = 30, jitter: float = 0.0,
                      block: int = 256, interpret: bool = False
                      ) -> SocpSolution:
    """Drop-in batched solver: c (B, NV), G (B, NR, NV), h (B, NR)."""
    B, nr, nv = G.shape
    dt = G.dtype
    Bp = max(block, -(-B // block) * block)

    def to_lanes(a):
        a = jnp.moveaxis(a, 0, -1)  # batch -> last
        pad = Bp - B
        if pad:
            a = jnp.concatenate([a, jnp.repeat(a[..., -1:], pad, axis=-1)],
                                axis=-1)
        return a

    Gl, hl, cl = to_lanes(G), to_lanes(h), to_lanes(c)
    kernel = _make_kernel(lay, nv, tol, max_iters, jitter)
    grid = (Bp // block,)

    def bspec(*dims):
        nd = len(dims)
        return pl.BlockSpec(dims + (block,),
                            lambda b: (0,) * nd + (b,),
                            memory_space=pltpu.VMEM)

    x, s, z, mu, iters = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[bspec(nr, nv), bspec(nr), bspec(nv)],
        out_specs=(bspec(nv), bspec(nr), bspec(nr), bspec(1), bspec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((nv, Bp), dt),
            jax.ShapeDtypeStruct((nr, Bp), dt),
            jax.ShapeDtypeStruct((nr, Bp), dt),
            jax.ShapeDtypeStruct((1, Bp), dt),
            jax.ShapeDtypeStruct((1, Bp), jnp.float32),
        ),
        interpret=interpret,
    )(Gl, hl, cl)

    back = lambda a: jnp.moveaxis(a, -1, 0)[:B]
    x, s, z = back(x), back(s), back(z)
    mu = back(mu)[:, 0]
    iters = back(iters)[:, 0].astype(jnp.int32)
    converged = jnp.isfinite(mu) & (mu < tol)
    return SocpSolution(x, s, z, iters, converged)
