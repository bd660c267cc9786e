"""Fused Pallas TPU kernel for the batched PDIP conic solver.

Same algorithm as :mod:`dcol_tpu.ops.pdip` (Mehrotra predictor-corrector with
NT scaling; see there for the reference mapping) but laid out for the TPU VPU:

  * **batch on full vregs**: every scalar of the tiny (NR x NV) conic problem
    is stored as ONE ``(SL, 128)`` array over the batch tile — exactly one
    VPU vector register at the default ``SL = 8`` (tile = 1024 lanes).  Each
    scalar op of the interior-point algorithm is therefore ONE vector
    instruction.  (The previous layout kept cone blocks as ``(rows, BT)``
    arrays: every scalar — Cholesky entries, dots, step lengths — was a
    ``(1, BT)`` value occupying 8 vregs at 1/8 sublane utilisation, and SOC
    head/tail ops paid ``jnp.concatenate`` relayouts.  Folding the batch
    into the sublane axis removed both: measured 1.65x on the cold kernel,
    8.8 -> 5.4 ms for the 70,400-problem quadrotor batch.)
  * **rows as Python lists**: a cone-block vector is a list of per-row
    ``(SL, 128)`` arrays; row reductions are unrolled adds, block
    concatenation is list concatenation (free), and the tiny Cholesky,
    triangular solves, and cone algebra unroll into straight-line VPU code
    with no relayouts.
  * **exact static layouts**: the kernel is specialised per
    :class:`~dcol_tpu.ops.cones.ConeLayout` — any combination of an orthant
    block (possibly absent) and 0-2 SOC blocks of exact dims.  Pair problems
    grouped by primitive kind (see ``CollisionScene.groups``) therefore pay
    zero padding rows: a polytope-polytope pair runs as a pure-orthant LP.
  * one ``pallas_call`` solves the whole batch: grid over batch tiles of
    ``SL*128`` lanes, all operands resident in VMEM.

The wrapper :func:`solve_socp_pallas` accepts/returns the same (B, ...)
convention as ``solve_socp`` and is numerically interchangeable with it
(tested batch-vs-batch in ``tests/test_pdip_pallas.py``).

The per-iteration math lives in :func:`_make_math` as pure functions over
lists of ``(SL, 128)`` arrays, shared between the kernel and
``tools/roofline.py`` (which traces one iteration to count the vector
instructions it issues).
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


def _rsum(rows):
    """Sum a list of (SL, 128) row arrays -> (SL, 128)."""
    acc = rows[0]
    for r in rows[1:]:
        acc = acc + r
    return acc


def _rmin(rows):
    acc = rows[0]
    for r in rows[1:]:
        acc = jnp.minimum(acc, r)
    return acc


# -- SOC block primitives (vectors = lists of (SL, 128) rows) ----------------

def _soc_quad(x):
    return x[0] * x[0] - _rsum([xi * xi for xi in x[1:]])


def _soc_prod(u, v):
    head = _rsum([ui * vi for ui, vi in zip(u, v)])
    return [head] + [u[0] * vi + v[0] * ui
                     for ui, vi in zip(u[1:], v[1:])]


def _soc_inv_pre(u):
    """Reciprocal factors of the SOC inverse product that depend on ``u``
    only — cached across the 2 ``inv_prod`` calls per Mehrotra iteration
    (VPU divides are multi-cycle)."""
    rho = _soc_quad(u)
    inv_rho = 1.0 / rho
    inv_u0 = 1.0 / u[0]
    b = rho * inv_u0 * inv_rho
    return inv_rho, inv_u0, b


def _soc_inv_prod(u, w, pre=None):
    inv_rho, inv_u0, b = _soc_inv_pre(u) if pre is None else pre
    nu = _rsum([ui * wi for ui, wi in zip(u[1:], w[1:])])
    a = (nu * inv_u0 - w[0]) * inv_rho
    head = (u[0] * w[0] - nu) * inv_rho
    return [head] + [a * ui + b * wi for ui, wi in zip(u[1:], w[1:])]


def _soc_nt(s, z):
    js = jnp.maximum(_soc_quad(s), _TINY)
    jz = jnp.maximum(_soc_quad(z), _TINY)
    rs, rz = jax.lax.rsqrt(js), jax.lax.rsqrt(jz)
    sbar = [si * rs for si in s]
    zbar = [zi * rz for zi in z]
    # 0.5/gamma via one rsqrt; gamma = sqrt((1 + <sbar, zbar>)/2)
    half_inv_gamma = 0.5 * jax.lax.rsqrt(
        (1.0 + _rsum([a * b for a, b in zip(sbar, zbar)])) * 0.5)
    wbar = [(sbar[0] + zbar[0]) * half_inv_gamma] + [
        (si - zi) * half_inv_gamma for si, zi in zip(sbar[1:], zbar[1:])]
    eta = (js * (1.0 / jz)) ** 0.25
    # cache 1/eta: the inverse apply runs ~10x per PDIP iteration (VPU
    # divides are multi-cycle; one divide here replaces one per apply)
    return (eta, 1.0 / eta), wbar


def _soc_apply(eta_pair, wbar, v, inverse):
    eta, eta_inv = eta_pair
    sgn = -1.0 if inverse else 1.0
    w1v1 = _rsum([wi * vi for wi, vi in zip(wbar[1:], v[1:])])
    head = wbar[0] * v[0] + sgn * w1v1
    coef = sgn * v[0] + w1v1 / (1.0 + wbar[0])
    scale = eta_inv if inverse else eta
    return [head * scale] + [(vi + coef * wi) * scale
                             for vi, wi in zip(v[1:], wbar[1:])]


def _soc_ls_pre(y):
    """Line-search factors that depend on the current iterate ``y`` only —
    cached across the affine + combined searches in one iteration (``s`` and
    ``z`` each feed 2 ``linesearch`` calls)."""
    nu = jnp.maximum(_soc_quad(y), _TINY)
    inv_nu = 1.0 / nu
    rsq = jax.lax.rsqrt(nu)  # 1/sqrt(nu)
    inv_den = 1.0 / (y[0] * rsq + 1.0)
    y_in = [yi * inv_nu for yi in y[1:]]
    return inv_nu, rsq, inv_den, y_in


def _soc_linesearch(y, d, pre=None):
    inv_nu, rsq, inv_den, y_in = _soc_ls_pre(y) if pre is None else pre
    zeta = y[0] * d[0] - _rsum([yi * di for yi, di in zip(y[1:], d[1:])])
    rho0 = zeta * inv_nu
    coef = (zeta * rsq + d[0]) * inv_den
    rv = [di * rsq - coef * yi for yi, di in zip(y_in, d[1:])]
    rnorm = jnp.sqrt(_rsum([ri * ri for ri in rv]))
    lim = 1.0 / jnp.maximum(rnorm - rho0, _TINY)
    return jnp.where(rnorm > rho0, jnp.minimum(1.0, lim), 1.0)


# -- composite-cone ops over static block lists ------------------------------
#
# ``kinds`` is a static tuple of 'ort' / 'soc' tags; cone vectors are tuples
# of per-block row lists aligned with it.  All loops unroll at trace time.

def _make_cone_ops(kinds):
    n_blocks = len(kinds)

    def prod(u, v):
        return tuple(
            [ui * vi for ui, vi in zip(u[i], v[i])] if kinds[i] == "ort"
            else _soc_prod(u[i], v[i]) for i in range(n_blocks))

    def inv_prod_pre(lam):
        """Factors of ``inv_prod`` that depend on ``lam`` only (reciprocals;
        cached across the 2 calls per Mehrotra iteration)."""
        return tuple(
            [1.0 / li for li in lam[i]] if kinds[i] == "ort"
            else _soc_inv_pre(lam[i]) for i in range(n_blocks))

    def inv_prod(lam, v, pre=None):
        if pre is None:
            pre = inv_prod_pre(lam)
        return tuple(
            [vi * ri for vi, ri in zip(v[i], pre[i])] if kinds[i] == "ort"
            else _soc_inv_prod(lam[i], v[i], pre[i]) for i in range(n_blocks))

    def nt(s, z):
        out = []
        for i in range(n_blocks):
            if kinds[i] == "ort":
                # w = sqrt(s/z), 1/w = rsqrt(s/z): one divide + sqrt + rsqrt
                q = [si / zi for si, zi in zip(s[i], z[i])]
                out.append(([jnp.sqrt(qi) for qi in q],
                            [jax.lax.rsqrt(qi) for qi in q]))
            else:
                out.append(_soc_nt(s[i], z[i]))
        return tuple(out)

    def W_apply(W, v, inverse=False):
        out = []
        for i in range(n_blocks):
            if kinds[i] == "ort":
                w, w_inv = W[i]
                m = w_inv if inverse else w
                out.append([vi * mi for vi, mi in zip(v[i], m)])
            else:
                eta_pair, wbar = W[i]
                out.append(_soc_apply(eta_pair, wbar, v[i], inverse))
        return tuple(out)

    def dot(u, v):
        return _rsum([ui * vi
                      for i in range(n_blocks)
                      for ui, vi in zip(u[i], v[i])])

    def axpy(a, u, v):
        return tuple([ui + a * vi for ui, vi in zip(u[i], v[i])]
                     for i in range(n_blocks))

    def select(m, u, v):
        return tuple([jnp.where(m, ui, vi) for ui, vi in zip(u[i], v[i])]
                     for i in range(n_blocks))

    def finite(u):
        acc = None
        for i in range(n_blocks):
            for ui in u[i]:
                f = jnp.isfinite(ui)
                acc = f if acc is None else acc & f
        return acc

    def ls_pre(y):
        """Per-block line-search factors depending on the iterate only
        (``s``/``z`` each feed the affine AND combined searches)."""
        return tuple(None if kinds[i] == "ort" else _soc_ls_pre(y[i])
                     for i in range(n_blocks))

    def linesearch(x, dx, pre=None):
        a = None
        for i in range(n_blocks):
            if kinds[i] == "ort":
                ratios = [jnp.where(di < 0,
                                    -xi / jnp.where(di < 0, di, -1.0),
                                    jnp.inf)
                          for xi, di in zip(x[i], dx[i])]
                ai = jnp.minimum(1.0, _rmin(ratios))
            else:
                ai = _soc_linesearch(x[i], dx[i],
                                     None if pre is None else pre[i])
            a = ai if a is None else jnp.minimum(a, ai)
        return a

    def bring2cone(r):
        a = None
        for i in range(n_blocks):
            if kinds[i] == "ort":
                ai = -_rmin(r[i])
            else:
                ai = -(r[i][0] - jnp.sqrt(_rsum([ri * ri
                                                 for ri in r[i][1:]])))
            a = ai if a is None else jnp.maximum(a, ai)
        shift = 1.0 + a
        ok = a < 0
        out = []
        for i in range(n_blocks):
            if kinds[i] == "ort":
                out.append([jnp.where(ok, ri, ri + shift) for ri in r[i]])
            else:
                out.append([jnp.where(ok, r[i][0], r[i][0] + shift)]
                           + list(r[i][1:]))
        return tuple(out)

    def add_head(u, sm):
        """u + sm*e blockwise (e = cone identity): full block for the
        orthant, head row only for SOCs."""
        out = []
        for i in range(n_blocks):
            if kinds[i] == "ort":
                out.append([ui + sm for ui in u[i]])
            else:
                out.append([u[i][0] + sm] + list(u[i][1:]))
        return tuple(out)

    return (prod, inv_prod, inv_prod_pre, nt, W_apply, dot, axpy, select,
            finite, linesearch, ls_pre, bring2cone, add_head)


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
    """M: dict {(i,j): (SL, 128)} lower triangle -> L entries, plus cached
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
    """b: list of (SL, 128) -> list of (SL, 128); Lr = (L, rdiag) from
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


def _make_math(lay: ConeLayout, nv: int, tol: float, jitter: float):
    """The per-tile PDIP math over lists of (SL, 128) row arrays, shared by
    the kernel and the instruction-count tool.

    Returns (cold_init, warm_init, body, cone-ops tuple).  ``Gc`` is the
    column-major constraint matrix: ``Gc[v]`` = tuple of per-block row lists.
    ``body(Gc, h, c, carry)`` performs one Mehrotra iteration on
    ``carry = (x, s, z, done_f, iters)``."""
    blocks = _layout_blocks(lay)
    kinds = tuple(b[0] for b in blocks)
    degree = lay.degree
    ops = _make_cone_ops(kinds)
    (cone_prod, inv_cone_prod, inv_cone_prod_pre, nt, W_app, dot, axpy,
     select, finite, linesearch, ls_pre, bring2cone, add_head) = ops
    nb = len(blocks)

    def matvec(cols, x):
        """sum_v cols[v] * x[v] blockwise; x: list of (SL, 128)."""
        acc = tuple([gr * x[0] for gr in cols[0][i]] for i in range(nb))
        for v in range(1, nv):
            acc = tuple([ai + gr * x[v]
                         for ai, gr in zip(acc[i], cols[v][i])]
                        for i in range(nb))
        return acc

    def rmatvec(cols, zt):
        """G' z -> list of (SL, 128)."""
        return [dot(cols[v], zt) for v in range(nv)]

    def gram(cols):
        return {(i, j): dot(cols[i], cols[j])
                for i in range(nv) for j in range(i + 1)}

    neg = lambda u: tuple([-r for r in u[i]] for i in range(nb))

    def cold_init(Gc, h, c):
        """pdip.py initialize: least-squares + bring2cone."""
        L0 = _chol_factor(gram(Gc), nv, jitter)
        x = _chol_solve(L0, rmatvec(Gc, h), nv)
        Gx = matvec(Gc, x)
        s = bring2cone(tuple([gi - hi for gi, hi in zip(Gx[i], h[i])]
                             for i in range(nb)))
        xd = _chol_solve(L0, [-ci for ci in c], nv)
        z = bring2cone(matvec(Gc, xd))
        return x, s, z

    def warm_init(xw, sw, zw, margin):
        """Previous optimum shifted strictly into the cone interior."""
        s = bring2cone(add_head(sw, margin))
        z = bring2cone(add_head(zw, margin))
        return list(xw), s, z

    def body(Gc, h, c, carry):
        x, s, z, done_f, iters = carry
        done = done_f > 0.5
        W = nt(s, z)
        lam = W_app(W, z)
        lam_lam = cone_prod(lam, lam)
        rx = rmatvec(Gc, z)
        rx = [rx[v] + c[v] for v in range(nv)]
        Gx = matvec(Gc, x)
        rz = tuple([si + gi - hi
                    for si, gi, hi in zip(s[i], Gx[i], h[i])]
                   for i in range(nb))
        mu = dot(s, z) * (1.0 / degree)
        new_done = done | (mu < tol) | ~(mu == mu)

        Gt = [W_app(W, Gc[v], inverse=True) for v in range(nv)]
        L = _chol_factor(gram(Gt), nv, jitter)

        def newton(lam_ds):
            wlds = W_app(W, lam_ds)
            rhs = tuple([-ri - wi for ri, wi in zip(rz[i], wlds[i])]
                        for i in range(nb))
            b_z = W_app(W, rhs, inverse=True)
            bvec = [-rx[v] + dot(Gt[v], b_z) for v in range(nv)]
            dx = _chol_solve(L, bvec, nv)
            Gtdx = matvec(Gt, dx)
            dz = W_app(W, tuple([gi - bi
                                 for gi, bi in zip(Gtdx[i], b_z[i])]
                                for i in range(nb)),
                       inverse=True)
            wdz = W_app(W, dz)
            ds = W_app(W, tuple([li - wi
                                 for li, wi in zip(lam_ds[i], wdz[i])]
                                for i in range(nb)))
            return dx, ds, dz

        lam_pre = inv_cone_prod_pre(lam)
        s_pre, z_pre = ls_pre(s), ls_pre(z)
        dx_a, ds_a, dz_a = newton(inv_cone_prod(lam, neg(lam_lam), lam_pre))
        a_aff = jnp.minimum(linesearch(s, ds_a, s_pre),
                            linesearch(z, dz_a, z_pre))
        rho = (dot(axpy(a_aff, s, ds_a), axpy(a_aff, z, dz_a))
               / dot(s, z))
        sigma = jnp.clip(rho, 0.0, 1.0) ** 3
        sm = sigma * mu

        comb = cone_prod(W_app(W, ds_a, inverse=True), W_app(W, dz_a))
        ds_rhs = add_head(
            tuple([-li - ci for li, ci in zip(lam_lam[i], comb[i])]
                  for i in range(nb)), sm)
        dx_c, ds_c, dz_c = newton(inv_cone_prod(lam, ds_rhs, lam_pre))
        a = jnp.minimum(
            1.0, 0.99 * jnp.minimum(linesearch(s, ds_c, s_pre),
                                    linesearch(z, dz_c, z_pre)))

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
        return (x, s, z,
                jnp.where(new_done, 1.0, 0.0).astype(x[0].dtype), iters)

    def mu_of(s, z):
        return dot(s, z) * (1.0 / degree)

    return cold_init, warm_init, body, mu_of, blocks


def _make_kernel(lay: ConeLayout, nv: int, tol: float, max_iters: int,
                 jitter: float, use_warm: bool = False,
                 use_skip: bool = False, warm_margin: float = 1e-3):
    cold_init, warm_init, body, mu_of, blocks = _make_math(
        lay, nv, tol, jitter)
    nr = lay.nr

    def split_rows(ref):
        """(nr, SL, 128) ref -> tuple of per-block row lists."""
        return tuple([ref[o + i] for i in range(r)] for _, o, r in blocks)

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
        dt = G_ref.dtype
        SL = G_ref.shape[-2]
        # G columns per cone block: G_ref is (nv*nr, SL, 128), row-major in
        # (v, row); each entry one (SL, 128) vreg tile
        Gc = [tuple([G_ref[v * nr + o + i] for i in range(r)]
                    for _, o, r in blocks) for v in range(nv)]
        h = split_rows(h_ref)
        c = [c_ref[v] for v in range(nv)]

        if use_warm:
            xw = [xw_ref[v] for v in range(nv)]
            x, s, z = warm_init(xw, split_rows(sw_ref), split_rows(zw_ref),
                                warm_margin)
        else:
            x, s, z = cold_init(Gc, h, c)

        # NOTE: the loop carry holds the done-mask as f32 (1.0 = done) —
        # Mosaic cannot legalize scf.for with vector<i1> carries
        if use_skip:
            # skip-flagged lanes start done: an all-skipped batch tile exits
            # the while_loop after ZERO body iterations (output = the
            # initial/warm iterate) — the caller discards their results
            done = skip_ref[0].astype(dt)
        else:
            done = jnp.zeros((SL, 128), dtype=dt)
        iters = jnp.zeros((SL, 128), dtype=jnp.float32)

        # while_loop with an all-done early exit: the mean iteration count
        # (~8-12) is well under max_iters, so exiting early wins ~2-3x over a
        # fixed fori_loop.  The scalar condition reduces the lane mask.
        def cond(carry):
            i, x, s, z, done_f, iters = carry
            return (i < max_iters) & (jnp.min(done_f) < 0.5)

        def wbody(carry):
            i, x, s, z, done_f, iters = carry
            return (i + 1,) + body(Gc, h, c, (x, s, z, done_f, iters))

        _, x, s, z, done, iters = jax.lax.while_loop(
            cond, wbody, (jnp.zeros((), jnp.int32), x, s, z, done, iters))

        for v in range(nv):
            x_ref[v] = x[v]
        srows = [r for blk in s for r in blk]
        zrows = [r for blk in z for r in blk]
        for i in range(nr):
            s_ref[i] = srows[i]
            z_ref[i] = zrows[i]
        mu_ref[0] = mu_of(s, z)
        it_ref[0] = iters

    return kernel


def tile_dims(B: int, block: int):
    """(clamped block, padded batch) for the kernel's lane-tile geometry —
    shared with the direct-tiled assembly builder
    (:meth:`CollisionScene.assemble_groups_tiled`), which must pad batches
    identically."""
    block = max(128, min(block, -(-B // 128) * 128))
    Bp = max(block, -(-B // block) * block)
    return block, Bp


@partial(jax.jit, static_argnames=("lay", "tol", "max_iters", "jitter",
                                   "block", "interpret", "warm_margin",
                                   "batch_size"))
def solve_socp_pallas(c, G, h, lay: ConeLayout, *, tol: float = 1e-6,
                      max_iters: int = 30, jitter: float = 0.0,
                      block: int = 1024, interpret: bool = False,
                      warm=None, skip=None,
                      warm_margin: float = 1e-3,
                      tiled=None, batch_size: int = None) -> SocpSolution:
    """Drop-in batched solver: c (B, NV), G (B, NR, NV), h (B, NR).
    ``warm``: optional (x, s, z) triple from a previous nearby solve.
    ``skip``: optional (B,) bool — members whose result the caller discards;
    they start in the done state, so an all-skipped batch tile costs ZERO
    solver iterations (see solve_socp).
    ``block`` is the lane-tile width (a multiple of 128; 1024 = 8 sublanes x
    128 lanes = one full vreg per scalar); it is clamped down to the
    128-padded batch so small batches never pay instruction issue for unused
    lanes.
    ``tiled``: optional (cl, Gl, hl) operands ALREADY in the kernel's tile
    layout ((nv, nt, 128) / (nv*nr, nt, 128) / (nr, nt, 128), batch padded
    per :func:`tile_dims`), with ``batch_size`` the true batch B (static).
    Built by the entry-wise assembly — skips the batch-to-lanes transpose
    that otherwise dominates the constraint call (docs/PROFILE.md round-5c);
    c/G/h are ignored (pass None)."""
    if tiled is not None:
        cl_t, Gl_t, hl_t = tiled
        B = batch_size
        nr = lay.nr
        nv = cl_t.shape[-3]
        dt = Gl_t.dtype
    else:
        B, nr, nv = G.shape
        dt = G.dtype
    assert nr == lay.nr, (nr, lay)
    if skip is not None and warm is None:
        raise ValueError(
            "skip= requires warm=: a skipped member's output is its entry "
            "iterate, which is only meaningful as a previous converged "
            "solution, not the cold least-squares initializer")
    block, Bp = tile_dims(B, block)
    SL = block // 128

    def to_tiles(a):
        """(B, dims...) -> (prod(dims), Bp//128, 128): batch folded into
        (sublane-group, lane) tiles, leading problem dims flattened."""
        a = jnp.moveaxis(a, 0, -1)  # batch -> last
        pad = Bp - B
        if pad:
            a = jnp.concatenate([a, jnp.repeat(a[..., -1:], pad, axis=-1)],
                                axis=-1)
        return a.reshape((-1, Bp // 128, 128))

    if tiled is not None:
        assert Gl_t.shape[-3:] == (nv * nr, Bp // 128, 128), (
            Gl_t.shape, nv, nr, Bp)
        inputs = [Gl_t, hl_t, cl_t]
    else:
        # G: (B, nr, nv) -> rows (v, r) row-major (kernel indexing)
        Gl = to_tiles(jnp.swapaxes(G, -1, -2))  # (nv*nr, Bp//128, 128)
        hl, cl = to_tiles(h), to_tiles(c)
        inputs = [Gl, hl, cl]
    kernel = _make_kernel(lay, nv, tol, max_iters, jitter,
                          use_warm=warm is not None,
                          use_skip=skip is not None,
                          warm_margin=warm_margin)
    grid = (Bp // block,)

    def bspec(rows):
        return pl.BlockSpec((rows, SL, 128), lambda b: (0, b, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [bspec(nr * nv), bspec(nr), bspec(nv)]
    if warm is not None:
        xw, sw, zw = warm
        inputs += [to_tiles(xw.astype(dt)), to_tiles(sw.astype(dt)),
                   to_tiles(zw.astype(dt))]
        in_specs += [bspec(nv), bspec(nr), bspec(nr)]
    if skip is not None:
        inputs.append(to_tiles(
            jnp.broadcast_to(skip, (B,)).astype(dt)[:, None]))
        in_specs.append(bspec(1))

    nt = Bp // 128
    x, s, z, mu, iters = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(bspec(nv), bspec(nr), bspec(nr), bspec(1), bspec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((nv, nt, 128), dt),
            jax.ShapeDtypeStruct((nr, nt, 128), dt),
            jax.ShapeDtypeStruct((nr, nt, 128), dt),
            jax.ShapeDtypeStruct((1, nt, 128), dt),
            jax.ShapeDtypeStruct((1, nt, 128), jnp.float32),
        ),
        interpret=interpret,
    )(*inputs)

    def back(a):
        a = a.reshape(a.shape[0], Bp)
        return jnp.moveaxis(a, -1, 0)[:B]

    x, s, z = back(x), back(s), back(z)
    mu = back(mu)[:, 0]
    iters = back(iters)[:, 0].astype(jnp.int32)
    converged = jnp.isfinite(mu) & (mu < tol)
    return SocpSolution(x, s, z, iters, converged)
