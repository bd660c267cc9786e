"""Fused Pallas TPU kernel for the batched PDIP conic solver.

Same algorithm as :mod:`dcol_tpu.ops.pdip` (Mehrotra predictor-corrector with
NT scaling; see there for the reference mapping) but laid out for the TPU VPU:

  * **batch on lanes**: every quantity of the tiny (NR x NV) conic problem is
    stored problem-major with the scenario batch on the LAST axis, so each
    scalar of the algorithm is one 128-lane vector op over the batch tile.
    The XLA path's (B, NR, NV) layout pads NV=4..8 up to 128 lanes (>90%
    lane waste); this layout wastes nothing.
  * **pure 2-D working set**: cone blocks (orthant / SOCs) and matrix
    columns are separate 2-D ``(rows, BT)`` values read straight from the
    refs — Mosaic's vector layouts stay offset-free, and the tiny Cholesky,
    triangular solves, and cone algebra unroll into straight-line VPU code.
  * **exact static layouts**: the kernel is specialised per
    :class:`~dcol_tpu.ops.cones.ConeLayout` — any combination of an orthant
    block (possibly absent) and 0-2 SOC blocks of exact dims.  Pair problems
    grouped by primitive kind (see ``CollisionScene.groups``) therefore pay
    zero padding rows: a polytope-polytope pair runs as a pure-orthant LP.
  * one ``pallas_call`` solves the whole batch: grid over batch tiles of
    ``BT`` lanes, all operands resident in VMEM (~100 KB/tile).

The wrapper :func:`solve_socp_pallas` accepts/returns the same (B, ...)
convention as ``solve_socp`` and is numerically interchangeable with it
(tested batch-vs-batch in ``tests/test_pdip_pallas.py``).

Vectors over the composite cone are tuples of per-block ``(rows, BT)``
arrays (one entry per present cone block); the NV-dim primal lives as a
list of ``(1, BT)`` rows.
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


# -- SOC block primitives ----------------------------------------------------

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


def _soc_linesearch(y, d):
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


# -- composite-cone ops over static block lists ------------------------------
#
# ``kinds`` is a static tuple of 'ort' / 'soc' tags; cone vectors are tuples
# of (rows, BT) arrays aligned with it.  All loops below unroll at trace time.

def _make_cone_ops(kinds):
    n_blocks = len(kinds)

    def prod(u, v):
        return tuple(
            u[i] * v[i] if kinds[i] == "ort" else _soc_prod(u[i], v[i])
            for i in range(n_blocks))

    def inv_prod(lam, v):
        return tuple(
            v[i] / lam[i] if kinds[i] == "ort" else _soc_inv_prod(lam[i], v[i])
            for i in range(n_blocks))

    def nt(s, z):
        out = []
        for i in range(n_blocks):
            if kinds[i] == "ort":
                w = jnp.sqrt(s[i] / z[i])
                out.append((w, 1.0 / w))
            else:
                out.append(_soc_nt(s[i], z[i]))
        return tuple(out)

    def W_apply(W, v, inverse=False):
        out = []
        for i in range(n_blocks):
            if kinds[i] == "ort":
                w, w_inv = W[i]
                out.append(v[i] * (w_inv if inverse else w))
            else:
                eta_pair, wbar = W[i]
                out.append(_soc_apply(eta_pair, wbar, v[i], inverse))
        return tuple(out)

    def dot(u, v):
        acc = _rsum(u[0] * v[0])
        for i in range(1, n_blocks):
            acc = acc + _rsum(u[i] * v[i])
        return acc

    def axpy(a, u, v):
        return tuple(u[i] + a * v[i] for i in range(n_blocks))

    def select(m, u, v):
        return tuple(jnp.where(m, u[i], v[i]) for i in range(n_blocks))

    def finite(u):
        acc = jnp.all(jnp.isfinite(u[0]), axis=0, keepdims=True)
        for i in range(1, n_blocks):
            acc = acc & jnp.all(jnp.isfinite(u[i]), axis=0, keepdims=True)
        return acc

    def linesearch(x, dx):
        a = None
        for i in range(n_blocks):
            if kinds[i] == "ort":
                xo, do = x[i], dx[i]
                negm = do < 0
                ratios = jnp.where(negm, -xo / jnp.where(negm, do, -1.0),
                                   jnp.inf)
                ai = jnp.minimum(1.0, _rmin(ratios))
            else:
                ai = _soc_linesearch(x[i], dx[i])
            a = ai if a is None else jnp.minimum(a, ai)
        return a

    def bring2cone(r):
        a = None
        for i in range(n_blocks):
            if kinds[i] == "ort":
                ai = -_rmin(r[i])
            else:
                ai = -(r[i][0:1] - jnp.sqrt(_rsum(r[i][1:] ** 2)))
            a = ai if a is None else jnp.maximum(a, ai)
        shift = 1.0 + a
        ok = a < 0
        out = []
        for i in range(n_blocks):
            if kinds[i] == "ort":
                ri = r[i] + shift
            else:
                ri = jnp.concatenate([r[i][0:1] + shift, r[i][1:]], axis=0)
            out.append(jnp.where(ok, r[i], ri))
        return tuple(out)

    def add_head(u, sm):
        """u + sm*e blockwise (e = cone identity): full block for the
        orthant, head row only for SOCs."""
        out = []
        for i in range(n_blocks):
            if kinds[i] == "ort":
                out.append(u[i] + sm)
            else:
                out.append(jnp.concatenate([u[i][0:1] + sm, u[i][1:]], axis=0))
        return tuple(out)

    return (prod, inv_prod, nt, W_apply, dot, axpy, select, finite,
            linesearch, bring2cone, add_head)


def _layout_blocks(lay: ConeLayout):
    """Static (kind, row-offset, rows) triples for the present cone blocks."""
    blocks = []
    if lay.n_ort:
        blocks.append(("ort", 0, lay.n_ort))
    if lay.s1:
        blocks.append(("soc", lay.n_ort, lay.s1))
    if lay.s2:
        blocks.append(("soc", lay.n_ort + lay.s1, lay.s2))
    return tuple(blocks)


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
                 jitter: float, use_warm: bool = False,
                 use_skip: bool = False, warm_margin: float = 1e-3):
    blocks = _layout_blocks(lay)
    kinds = tuple(b[0] for b in blocks)
    degree = lay.degree
    (cone_prod, inv_cone_prod, nt, W_app, dot, axpy, select, finite,
     linesearch, bring2cone, add_head) = _make_cone_ops(kinds)

    def split_rows(ref_or_arr):
        return tuple(ref_or_arr[o:o + r, :] for _, o, r in blocks)

    def kernel(*refs):
        skip_ref = None
        if use_skip:  # skip is always the LAST input (before the 5 outputs)
            skip_ref = refs[-6]
            refs = refs[:-6] + refs[-5:]
        if use_warm:
            (G_ref, h_ref, c_ref, xw_ref, sw_ref, zw_ref,
             x_ref, s_ref, z_ref, mu_ref, it_ref) = refs
        else:
            G_ref, h_ref, c_ref, x_ref, s_ref, z_ref, mu_ref, it_ref = refs
        BT = G_ref.shape[-1]
        dt = G_ref.dtype
        # G columns per cone block: pure 2-D values straight from the ref
        Gc = [tuple(G_ref[o:o + r, v, :] for _, o, r in blocks)
              for v in range(nv)]
        h = split_rows(h_ref)
        c = [c_ref[v:v + 1, :] for v in range(nv)]

        def matvec(cols, x):
            """sum_v cols[v] * x[v] blockwise; x: list of (1, BT)."""
            acc = tuple(cols[0][i] * x[0] for i in range(len(blocks)))
            for v in range(1, nv):
                acc = tuple(acc[i] + cols[v][i] * x[v]
                            for i in range(len(blocks)))
            return acc

        def rmatvec(cols, zt):
            """G' z -> list of (1, BT)."""
            return [dot(cols[v], zt) for v in range(nv)]

        def gram(cols):
            return {(i, j): dot(cols[i], cols[j])
                    for i in range(nv) for j in range(i + 1)}

        neg = lambda u: tuple(-ui for ui in u)
        if use_warm:
            # previous optimum shifted strictly into the cone interior
            margin = warm_margin
            x = [xw_ref[v:v + 1, :] for v in range(nv)]
            sw = split_rows(sw_ref)
            zw = split_rows(zw_ref)
            s = bring2cone(add_head(sw, margin))
            z = bring2cone(add_head(zw, margin))
        else:
            # cold start (pdip.py initialize)
            L0 = _chol_factor(gram(Gc), nv, jitter)
            x = _chol_solve(L0, rmatvec(Gc, h), nv)
            Gx = matvec(Gc, x)
            s = bring2cone(axpy(jnp.full((1, BT), -1.0, dt), Gx, h))
            xd = _chol_solve(L0, [-ci for ci in c], nv)
            z = bring2cone(matvec(Gc, xd))

        # NOTE: the loop carry holds the done-mask as f32 (1.0 = done) —
        # Mosaic cannot legalize scf.for with vector<i1> carries
        if use_skip:
            # skip-flagged lanes start done: an all-skipped batch tile exits
            # the while_loop after ZERO body iterations (output = the
            # initial/warm iterate) — the caller discards their results
            done = skip_ref[...].astype(dt)
        else:
            done = jnp.zeros((1, BT), dtype=dt)
        iters = jnp.zeros((1, BT), dtype=jnp.float32)

        def body(_, carry):
            x, s, z, done_f, iters = carry
            done = done_f > 0.5
            W = nt(s, z)
            lam = W_app(W, z)
            lam_lam = cone_prod(lam, lam)
            rx = rmatvec(Gc, z)            # + c below
            rx = [rx[v] + c[v] for v in range(nv)]
            Gx = matvec(Gc, x)
            rz = tuple(s[i] + Gx[i] - h[i] for i in range(len(blocks)))
            mu = dot(s, z) / degree
            new_done = done | (mu < tol) | ~(mu == mu)

            Gt = [W_app(W, Gc[v], inverse=True) for v in range(nv)]
            L = _chol_factor(gram(Gt), nv, jitter)

            def newton(lam_ds):
                wlds = W_app(W, lam_ds)
                rhs = tuple(-rz[i] - wlds[i] for i in range(len(blocks)))
                b_z = W_app(W, rhs, inverse=True)
                bvec = [-rx[v] + dot(Gt[v], b_z) for v in range(nv)]
                dx = _chol_solve(L, bvec, nv)
                Gtdx = matvec(Gt, dx)
                dz = W_app(W, tuple(Gtdx[i] - b_z[i]
                                    for i in range(len(blocks))),
                           inverse=True)
                wdz = W_app(W, dz)
                ds = W_app(W, tuple(lam_ds[i] - wdz[i]
                                    for i in range(len(blocks))))
                return dx, ds, dz

            dx_a, ds_a, dz_a = newton(inv_cone_prod(lam, neg(lam_lam)))
            a_aff = jnp.minimum(linesearch(s, ds_a), linesearch(z, dz_a))
            rho = (dot(axpy(a_aff, s, ds_a), axpy(a_aff, z, dz_a))
                   / dot(s, z))
            sigma = jnp.clip(rho, 0.0, 1.0) ** 3
            sm = sigma * mu

            comb = cone_prod(W_app(W, ds_a, inverse=True), W_app(W, dz_a))
            ds_rhs = add_head(
                tuple(-lam_lam[i] - comb[i] for i in range(len(blocks))), sm)
            dx_c, ds_c, dz_c = newton(inv_cone_prod(lam, ds_rhs))
            a = jnp.minimum(
                1.0, 0.99 * jnp.minimum(linesearch(s, ds_c),
                                        linesearch(z, dz_c)))

            xn = [x[v] + a * dx_c[v] for v in range(nv)]
            sn = axpy(a, s, ds_c)
            zn = axpy(a, z, dz_c)
            goodx = jnp.ones_like(done)
            for v in range(nv):
                goodx = goodx & jnp.isfinite(xn[v])
            good = goodx & finite(sn) & finite(zn)
            act = ~new_done & good
            x = [jnp.where(act, xn[v], x[v]) for v in range(nv)]
            s = select(act, sn, s)
            z = select(act, zn, z)
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
        mu_ref[:] = dot(s, z) / degree
        it_ref[:] = iters

    return kernel


@partial(jax.jit, static_argnames=("lay", "tol", "max_iters", "jitter",
                                   "block", "interpret", "warm_margin"))
def solve_socp_pallas(c, G, h, lay: ConeLayout, *, tol: float = 1e-6,
                      max_iters: int = 30, jitter: float = 0.0,
                      block: int = 1024, interpret: bool = False,
                      warm=None, skip=None,
                      warm_margin: float = 1e-3) -> SocpSolution:
    """Drop-in batched solver: c (B, NV), G (B, NR, NV), h (B, NR).
    ``warm``: optional (x, s, z) triple from a previous nearby solve.
    ``skip``: optional (B,) bool — members whose result the caller discards;
    they start in the done state, so an all-skipped batch tile costs ZERO
    solver iterations (see solve_socp).
    ``block`` is the lane-tile width; it is clamped down to the 128-padded
    batch so small batches never pay instruction issue for unused lanes."""
    B, nr, nv = G.shape
    assert nr == lay.nr, (nr, lay)
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
                          use_warm=warm is not None,
                          use_skip=skip is not None,
                          warm_margin=warm_margin)
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
    if skip is not None:
        inputs.append(to_lanes(
            jnp.broadcast_to(skip, (B,)).astype(dt)[:, None]))
        in_specs.append(bspec(1))

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
