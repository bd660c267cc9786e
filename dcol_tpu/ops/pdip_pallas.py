"""Fused Pallas TPU kernel for the batched PDIP conic solver.

Same algorithm as :mod:`dcol_tpu.ops.pdip` (Mehrotra predictor-corrector with
NT scaling; see there for the reference mapping) but laid out for the TPU VPU:

  * **batch on lanes**: every quantity of the tiny (NR x NV) conic problem is
    stored problem-major with the scenario batch on the LAST axis, so each
    scalar of the algorithm is one 128-lane vector op over the batch tile.
    The XLA path's (B, NR, NV) layout pads NV=6..8 up to 128 lanes (>90%
    lane waste); this layout wastes nothing.
  * **pure 2-D working set**: cone blocks (orthant / SOC1 / SOC2) and matrix
    columns are separate 2-D ``(rows, BT)`` values read straight from the
    refs — Mosaic's vector layouts stay offset-free, and the 8x8 Cholesky,
    triangular solves, and cone algebra unroll into straight-line VPU code.
  * one ``pallas_call`` solves the whole batch: grid over batch tiles of
    ``BT`` lanes, all operands resident in VMEM (~100 KB/tile).

The wrapper :func:`solve_socp_pallas` accepts/returns the same (B, ...)
convention as ``solve_socp`` and is numerically interchangeable with it
(tested batch-vs-batch in ``tests/test_pdip_pallas.py``).

Vectors over the composite cone are triples ``(v_ort (n,BT), v1 (S,BT),
v2 (S,BT))``; the NV-dim primal lives as a list of ``(1, BT)`` rows.
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


def _rsum(a):
    """Row-axis reduction -> (1, BT)."""
    return jnp.sum(a, axis=0, keepdims=True)


def _rmin(a):
    return jnp.min(a, axis=0, keepdims=True)


# -- cone-block triple algebra ---------------------------------------------

def _soc_quad(x):
    return x[0:1] ** 2 - _rsum(x[1:] ** 2)


def _soc_prod(u, v):
    return jnp.concatenate(
        [_rsum(u * v), u[0:1] * v[1:] + v[0:1] * u[1:]], axis=0)


def _soc_inv_prod(u, w):
    u0, u1 = u[0:1], u[1:]
    w0, w1 = w[0:1], w[1:]
    rho = _soc_quad(u)
    nu = _rsum(u1 * w1)
    head = u0 * w0 - nu
    tail = (nu / u0 - w0) * u1 + (rho / u0) * w1
    return jnp.concatenate([head, tail], axis=0) / rho


def _soc_nt(s, z):
    js = jnp.maximum(_soc_quad(s), _TINY)
    jz = jnp.maximum(_soc_quad(z), _TINY)
    sbar = s / jnp.sqrt(js)
    zbar = z / jnp.sqrt(jz)
    gamma = jnp.sqrt((1.0 + _rsum(sbar * zbar)) / 2.0)
    Jz = jnp.concatenate([zbar[0:1], -zbar[1:]], axis=0)
    wbar = (sbar + Jz) / (2.0 * gamma)
    eta = (js / jz) ** 0.25
    # cache 1/eta: the inverse apply runs ~10x per PDIP iteration (VPU
    # divides are multi-cycle; one divide here replaces one per apply)
    return (eta, 1.0 / eta), wbar


def _soc_apply(eta_pair, wbar, v, inverse):
    eta, eta_inv = eta_pair
    w0, w1 = wbar[0:1], wbar[1:]
    sgn = -1.0 if inverse else 1.0
    v0, v1 = v[0:1], v[1:]
    w1v1 = _rsum(w1 * v1)
    head = w0 * v0 + sgn * w1v1
    tail = v1 + (sgn * v0 + w1v1 / (1.0 + w0)) * w1
    out = jnp.concatenate([head, tail], axis=0)
    return out * eta_inv if inverse else out * eta


def _cone_prod(u, v):
    return (u[0] * v[0], _soc_prod(u[1], v[1]), _soc_prod(u[2], v[2]))


def _inv_cone_prod(lam, v):
    return (v[0] / lam[0], _soc_inv_prod(lam[1], v[1]),
            _soc_inv_prod(lam[2], v[2]))


def _nt(s, z):
    w_ort = jnp.sqrt(s[0] / z[0])
    return ((w_ort, 1.0 / w_ort), _soc_nt(s[1], z[1]), _soc_nt(s[2], z[2]))


def _W(W, v, inverse=False):
    (w_ort, w_ort_inv), (e1, w1), (e2, w2) = W
    o = v[0] * (w_ort_inv if inverse else w_ort)
    return (o, _soc_apply(e1, w1, v[1], inverse),
            _soc_apply(e2, w2, v[2], inverse))


def _dot(u, v):
    """<u, v> over the whole cone -> (1, BT)."""
    return _rsum(u[0] * v[0]) + _rsum(u[1] * v[1]) + _rsum(u[2] * v[2])


def _axpy(a, u, v):
    """u + a*v blockwise; a: (1, BT)."""
    return (u[0] + a * v[0], u[1] + a * v[1], u[2] + a * v[2])


def _select(m, u, v):
    """where(m, u, v) blockwise; m: (1, BT) bool."""
    return (jnp.where(m, u[0], v[0]), jnp.where(m, u[1], v[1]),
            jnp.where(m, u[2], v[2]))


def _finite(u):
    return (jnp.all(jnp.isfinite(u[0]), axis=0, keepdims=True)
            & jnp.all(jnp.isfinite(u[1]), axis=0, keepdims=True)
            & jnp.all(jnp.isfinite(u[2]), axis=0, keepdims=True))


def _linesearch(x, dx):
    xo, do = x[0], dx[0]
    neg = do < 0
    ratios = jnp.where(neg, -xo / jnp.where(neg, do, -1.0), jnp.inf)
    a = jnp.minimum(1.0, _rmin(ratios))

    def soc_ls(y, d):
        y0, yv = y[0:1], y[1:]
        d0, dv = d[0:1], d[1:]
        nu = jnp.maximum(_soc_quad(y), _TINY)
        sq = jnp.sqrt(nu)
        zeta = y0 * d0 - _rsum(yv * dv)
        rho0 = zeta / nu
        coef = (zeta / sq + d0) / (y0 / sq + 1.0)
        rv = dv / sq - coef * yv / nu
        rnorm = jnp.sqrt(_rsum(rv * rv))
        lim = 1.0 / jnp.maximum(rnorm - rho0, _TINY)
        return jnp.where(rnorm > rho0, jnp.minimum(1.0, lim), 1.0)

    a = jnp.minimum(a, soc_ls(x[1], dx[1]))
    a = jnp.minimum(a, soc_ls(x[2], dx[2]))
    return a


def _bring2cone(r, e_ort):
    a = -_rmin(r[0])
    a = jnp.maximum(a, -(r[1][0:1] - jnp.sqrt(_rsum(r[1][1:] ** 2))))
    a = jnp.maximum(a, -(r[2][0:1] - jnp.sqrt(_rsum(r[2][1:] ** 2))))
    shift = 1.0 + a
    ok = a < 0
    S = r[1].shape[0]
    zpad = jnp.zeros((S - 1, a.shape[-1]), r[0].dtype)
    soc_e = lambda blk: jnp.concatenate([blk[0:1] + shift, blk[1:]], axis=0)
    return (jnp.where(ok, r[0], r[0] + shift * e_ort),
            jnp.where(ok, r[1], soc_e(r[1])),
            jnp.where(ok, r[2], soc_e(r[2])))


def _chol_factor(M, nv, jitter):
    """M: dict {(i,j): (1, BT)} lower triangle -> L entries, plus cached
    reciprocals of the diagonal (VPU divides are multi-cycle; every factor
    is used by >= 2 triangular-solve pairs, so divide once, multiply after).
    """
    if jitter:
        tr = sum(M[(i, i)] for i in range(nv)) / nv
        M = {k: (v + jitter * tr if k[0] == k[1] else v)
             for k, v in M.items()}
    L = {}
    rdiag = [None] * nv
    for i in range(nv):
        for j in range(i + 1):
            sacc = M[(i, j)]
            for k in range(j):
                sacc = sacc - L[(i, k)] * L[(j, k)]
            if i == j:
                d = jnp.sqrt(sacc)
                L[(i, j)] = d
                rdiag[i] = 1.0 / d
            else:
                L[(i, j)] = sacc * rdiag[j]
    return L, rdiag


def _chol_solve(Lr, b, nv):
    """b: list of (1, BT) -> list of (1, BT); Lr = (L, rdiag) from
    _chol_factor."""
    L, rdiag = Lr
    y = [None] * nv
    for i in range(nv):
        sacc = b[i]
        for k in range(i):
            sacc = sacc - L[(i, k)] * y[k]
        y[i] = sacc * rdiag[i]
    x = [None] * nv
    for i in reversed(range(nv)):
        sacc = y[i]
        for k in range(i + 1, nv):
            sacc = sacc - L[(k, i)] * x[k]
        x[i] = sacc * rdiag[i]
    return x


def _make_kernel(lay: ConeLayout, nv: int, tol: float, max_iters: int,
                 jitter: float, use_warm: bool = False):
    n, S1, S2 = lay.n_ort, lay.s1, lay.s2
    degree = lay.degree

    def kernel(*refs):
        if use_warm:
            (G_ref, h_ref, c_ref, xw_ref, sw_ref, zw_ref,
             x_ref, s_ref, z_ref, mu_ref, it_ref) = refs
        else:
            G_ref, h_ref, c_ref, x_ref, s_ref, z_ref, mu_ref, it_ref = refs
        BT = G_ref.shape[-1]
        dt = G_ref.dtype
        # G columns per cone block: pure 2-D values straight from the ref
        Gc = [(G_ref[:n, v, :], G_ref[n:n + S1, v, :], G_ref[n + S1:, v, :])
              for v in range(nv)]
        h = (h_ref[:n, :], h_ref[n:n + S1, :], h_ref[n + S1:, :])
        c = [c_ref[v:v + 1, :] for v in range(nv)]
        e_ort = jnp.ones((n, BT), dt)

        def matvec(cols, x):
            """sum_v cols[v] * x[v] blockwise; x: list of (1, BT)."""
            o = cols[0][0] * x[0]
            b1 = cols[0][1] * x[0]
            b2 = cols[0][2] * x[0]
            for v in range(1, nv):
                o = o + cols[v][0] * x[v]
                b1 = b1 + cols[v][1] * x[v]
                b2 = b2 + cols[v][2] * x[v]
            return o, b1, b2

        def rmatvec(cols, zt):
            """G' z -> list of (1, BT)."""
            return [_dot(cols[v], zt) for v in range(nv)]

        def gram(cols):
            return {(i, j): _dot(cols[i], cols[j])
                    for i in range(nv) for j in range(i + 1)}

        neg = lambda u: (-u[0], -u[1], -u[2])
        if use_warm:
            # previous optimum shifted strictly into the cone interior
            margin = 1e-3
            x = [xw_ref[v:v + 1, :] for v in range(nv)]
            sw = (sw_ref[:n, :] + margin, sw_ref[n:n + S1, :],
                  sw_ref[n + S1:, :])
            zw = (zw_ref[:n, :] + margin, zw_ref[n:n + S1, :],
                  zw_ref[n + S1:, :])
            soc_m = lambda blk: jnp.concatenate(
                [blk[0:1] + margin, blk[1:]], axis=0)
            s = _bring2cone((sw[0], soc_m(sw[1]), soc_m(sw[2])), e_ort)
            z = _bring2cone((zw[0], soc_m(zw[1]), soc_m(zw[2])), e_ort)
        else:
            # cold start (pdip.py initialize)
            L0 = _chol_factor(gram(Gc), nv, jitter)
            x = _chol_solve(L0, rmatvec(Gc, h), nv)
            Gx = matvec(Gc, x)
            s = _bring2cone(_axpy(jnp.full((1, BT), -1.0, dt), Gx, h), e_ort)
            xd = _chol_solve(L0, [-ci for ci in c], nv)
            z = _bring2cone(matvec(Gc, xd), e_ort)

        # NOTE: the loop carry holds the done-mask as f32 (1.0 = done) —
        # Mosaic cannot legalize scf.for with vector<i1> carries
        done = jnp.zeros((1, BT), dtype=dt)
        iters = jnp.zeros((1, BT), dtype=jnp.float32)

        def body(_, carry):
            x, s, z, done_f, iters = carry
            done = done_f > 0.5
            W = _nt(s, z)
            lam = _W(W, z)
            lam_lam = _cone_prod(lam, lam)
            rx = rmatvec(Gc, z)            # + c below
            rx = [rx[v] + c[v] for v in range(nv)]
            Gx = matvec(Gc, x)
            rz = (s[0] + Gx[0] - h[0], s[1] + Gx[1] - h[1],
                  s[2] + Gx[2] - h[2])
            mu = _dot(s, z) / degree
            new_done = done | (mu < tol) | ~(mu == mu)

            Gt = [_W(W, Gc[v], inverse=True) for v in range(nv)]
            L = _chol_factor(gram(Gt), nv, jitter)

            def newton(lam_ds):
                wlds = _W(W, lam_ds)
                rhs = (-rz[0] - wlds[0], -rz[1] - wlds[1], -rz[2] - wlds[2])
                b_z = _W(W, rhs, inverse=True)
                bvec = [-rx[v] + _dot(Gt[v], b_z) for v in range(nv)]
                dx = _chol_solve(L, bvec, nv)
                Gtdx = matvec(Gt, dx)
                dz = _W(W, (Gtdx[0] - b_z[0], Gtdx[1] - b_z[1],
                            Gtdx[2] - b_z[2]), inverse=True)
                wdz = _W(W, dz)
                ds = _W(W, (lam_ds[0] - wdz[0], lam_ds[1] - wdz[1],
                            lam_ds[2] - wdz[2]))
                return dx, ds, dz

            dx_a, ds_a, dz_a = newton(_inv_cone_prod(lam, neg(lam_lam)))
            a_aff = jnp.minimum(_linesearch(s, ds_a), _linesearch(z, dz_a))
            rho = (_dot(_axpy(a_aff, s, ds_a), _axpy(a_aff, z, dz_a))
                   / _dot(s, z))
            sigma = jnp.clip(rho, 0.0, 1.0) ** 3
            sm = sigma * mu

            comb = _cone_prod(_W(W, ds_a, inverse=True), _W(W, dz_a))
            soc_e = lambda blk: jnp.concatenate(
                [blk[0:1] + sm, blk[1:]], axis=0)
            ds_rhs = (-lam_lam[0] - comb[0] + sm,
                      soc_e(-lam_lam[1] - comb[1]),
                      soc_e(-lam_lam[2] - comb[2]))
            dx_c, ds_c, dz_c = newton(_inv_cone_prod(lam, ds_rhs))
            a = jnp.minimum(
                1.0, 0.99 * jnp.minimum(_linesearch(s, ds_c),
                                        _linesearch(z, dz_c)))

            xn = [x[v] + a * dx_c[v] for v in range(nv)]
            sn = _axpy(a, s, ds_c)
            zn = _axpy(a, z, dz_c)
            goodx = jnp.ones_like(done)
            for v in range(nv):
                goodx = goodx & jnp.isfinite(xn[v])
            good = goodx & _finite(sn) & _finite(zn)
            act = ~new_done & good
            x = [jnp.where(act, xn[v], x[v]) for v in range(nv)]
            s = _select(act, sn, s)
            z = _select(act, zn, z)
            new_done = new_done | ~good
            iters = iters + jnp.where(act, 1.0, 0.0)
            return x, s, z, jnp.where(new_done, 1.0, 0.0).astype(x[0].dtype), iters

        # while_loop with an all-done early exit: the mean iteration count
        # (~8-12) is well under max_iters, so exiting early wins ~2-3x over a
        # fixed fori_loop.  The scalar condition reduces the lane mask.
        def cond(carry):
            i, x, s, z, done_f, iters = carry
            return (i < max_iters) & (jnp.min(done_f) < 0.5)

        def wbody(carry):
            i, *rest = carry
            return (i + 1,) + tuple(body(i, tuple(rest)))

        _, x, s, z, done, iters = jax.lax.while_loop(
            cond, wbody, (jnp.zeros((), jnp.int32), x, s, z, done, iters))

        x_ref[:] = jnp.concatenate(x, axis=0)
        s_ref[:] = jnp.concatenate(s, axis=0)
        z_ref[:] = jnp.concatenate(z, axis=0)
        mu_ref[:] = _dot(s, z) / degree
        it_ref[:] = iters

    return kernel


@partial(jax.jit, static_argnames=("lay", "tol", "max_iters", "jitter",
                                   "block", "interpret"))
def solve_socp_pallas(c, G, h, lay: ConeLayout, *, tol: float = 1e-6,
                      max_iters: int = 30, jitter: float = 0.0,
                      block: int = 1024, interpret: bool = False,
                      warm=None) -> SocpSolution:
    """Drop-in batched solver: c (B, NV), G (B, NR, NV), h (B, NR).
    ``warm``: optional (x, s, z) triple from a previous nearby solve.
    ``block`` is the lane-tile width; it is clamped down to the 128-padded
    batch so small batches never pay instruction issue for unused lanes."""
    B, nr, nv = G.shape
    dt = G.dtype
    block = max(128, min(block, -(-B // 128) * 128))
    Bp = max(block, -(-B // block) * block)

    def to_lanes(a):
        a = jnp.moveaxis(a, 0, -1)  # batch -> last
        pad = Bp - B
        if pad:
            a = jnp.concatenate([a, jnp.repeat(a[..., -1:], pad, axis=-1)],
                                axis=-1)
        return a

    Gl, hl, cl = to_lanes(G), to_lanes(h), to_lanes(c)
    inputs = [Gl, hl, cl]
    kernel = _make_kernel(lay, nv, tol, max_iters, jitter,
                          use_warm=warm is not None)
    grid = (Bp // block,)

    def bspec(*dims):
        nd = len(dims)
        return pl.BlockSpec(dims + (block,),
                            lambda b: (0,) * nd + (b,),
                            memory_space=pltpu.VMEM)

    in_specs = [bspec(nr, nv), bspec(nr), bspec(nv)]
    if warm is not None:
        xw, sw, zw = warm
        inputs += [to_lanes(xw.astype(dt)), to_lanes(sw.astype(dt)),
                   to_lanes(zw.astype(dt))]
        in_specs += [bspec(nv), bspec(nr), bspec(nr)]

    x, s, z, mu, iters = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(bspec(nv), bspec(nr), bspec(nr), bspec(1), bspec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((nv, Bp), dt),
            jax.ShapeDtypeStruct((nr, Bp), dt),
            jax.ShapeDtypeStruct((nr, Bp), dt),
            jax.ShapeDtypeStruct((1, Bp), dt),
            jax.ShapeDtypeStruct((1, Bp), jnp.float32),
        ),
        interpret=interpret,
    )(*inputs)

    back = lambda a: jnp.moveaxis(a, -1, 0)[:B]
    x, s, z = back(x), back(s), back(z)
    mu = back(mu)[:, 0]
    iters = back(iters)[:, 0].astype(jnp.int32)
    converged = jnp.isfinite(mu) & (mu < tol)
    return SocpSolution(x, s, z, iters, converged)
