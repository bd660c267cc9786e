"""Batched cone algebra for the composite cone  K = R^n_+ x SOC(s1) x SOC(s2).

Reference semantics: ``proximity/pdip.py`` (cone products, line searches) and
``proximity/NT/NT_scaling.py`` (Nesterov-Todd scaling).  TPU-first rewrite:

  * the cone layout is *static* (``ConeLayout``), slices resolve at trace time;
  * every op broadcasts over arbitrary leading batch dims (no ``vmap`` needed);
  * the SOC NT scaling uses the closed-form hyperbolic-Householder identity
    ``Wbar^{-1} = J Wbar J`` (valid because ``wbar' J wbar = 1``), eliminating
    the reference's per-iteration Cholesky of the scaling matrix
    (``NT_scaling.py:450-461``) and its column-by-column matrix solves
    (``NT_scaling.py:164-202``).

All functions treat the last axis as the cone axis.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

_TINY = 1e-25


@dataclasses.dataclass(frozen=True)
class ConeLayout:
    """Static row layout: [orthant (n_ort) | SOC1 (s1) | SOC2 (s2)]."""

    n_ort: int
    s1: int = 4
    s2: int = 4

    @property
    def nr(self) -> int:
        return self.n_ort + self.s1 + self.s2

    @property
    def degree(self) -> int:
        # Barrier degree: 1 per orthant row + 1 per SOC block
        # (pdip.py:401-406 in the reference).
        return self.n_ort + (self.s1 > 0) + (self.s2 > 0)

    def split(self, v):
        n = self.n_ort
        return v[..., :n], v[..., n : n + self.s1], v[..., n + self.s1 :]

    def join(self, o, a, b):
        return jnp.concatenate([o, a, b], axis=-1)


# ---------------------------------------------------------------------------
# SOC primitives (last axis = cone axis)
# ---------------------------------------------------------------------------

def soc_quad(x):
    """x0^2 - |x1|^2 (SOC quadratic form), shape (...,)."""
    return x[..., 0] ** 2 - jnp.sum(x[..., 1:] ** 2, axis=-1)


def soc_product(u, v):
    """Jordan product of two SOC vectors: [u.v ; u0 v1 + v0 u1]."""
    if u.shape[-1] == 0:
        return u
    head = jnp.sum(u * v, axis=-1, keepdims=True)
    tail = u[..., :1] * v[..., 1:] + v[..., :1] * u[..., 1:]
    return jnp.concatenate([head, tail], axis=-1)


def soc_inv_product(u, w):
    """v with u o v = w (inverse Jordan product), cf. pdip.py:88-122."""
    if u.shape[-1] == 0:
        return u
    u0 = u[..., :1]
    u1 = u[..., 1:]
    w0 = w[..., :1]
    w1 = w[..., 1:]
    rho = soc_quad(u)[..., None]
    nu = jnp.sum(u1 * w1, axis=-1, keepdims=True)
    head = u0 * w0 - nu
    tail = (nu / u0 - w0) * u1 + (rho / u0) * w1
    return jnp.concatenate([head, tail], axis=-1) / rho


def cone_product(lay: ConeLayout, u, v):
    uo, u1, u2 = lay.split(u)
    vo, v1, v2 = lay.split(v)
    return lay.join(uo * vo, soc_product(u1, v1), soc_product(u2, v2))


def inverse_cone_product(lay: ConeLayout, lam, v):
    lo, l1, l2 = lay.split(lam)
    vo, v1, v2 = lay.split(v)
    return lay.join(vo / lo, soc_inv_product(l1, v1), soc_inv_product(l2, v2))


def gen_e(lay: ConeLayout, dtype):
    """Identity element of the cone: ones on the orthant, e1 per SOC."""
    e = jnp.zeros((lay.nr,), dtype=dtype)
    e = e.at[: lay.n_ort].set(1.0)
    if lay.s1:
        e = e.at[lay.n_ort].set(1.0)
    if lay.s2:
        e = e.at[lay.n_ort + lay.s1].set(1.0)
    return e


# ---------------------------------------------------------------------------
# Line search (largest step keeping the iterate in the cone interior)
# ---------------------------------------------------------------------------

def _ort_linesearch(x, dx):
    ratios = jnp.where(dx < 0, -x / jnp.where(dx < 0, dx, -1.0), jnp.inf)
    return jnp.minimum(1.0, jnp.min(ratios, axis=-1))


def _soc_linesearch(y, d):
    """cf. pdip.py:25-52."""
    if y.shape[-1] == 0:
        return jnp.ones(y.shape[:-1], dtype=y.dtype)
    y0 = y[..., 0]
    yv = y[..., 1:]
    d0 = d[..., 0]
    dv = d[..., 1:]
    nu = jnp.maximum(soc_quad(y), _TINY)
    sq = jnp.sqrt(nu)
    zeta = y0 * d0 - jnp.sum(yv * dv, axis=-1)
    rho0 = zeta / nu
    coef = (zeta / sq + d0) / (y0 / sq + 1.0)
    rho_v = dv / sq[..., None] - coef[..., None] * yv / nu[..., None]
    rnorm = jnp.linalg.norm(rho_v, axis=-1)
    lim = 1.0 / jnp.maximum(rnorm - rho0, _TINY)
    return jnp.where(rnorm > rho0, jnp.minimum(1.0, lim), 1.0)


def linesearch(lay: ConeLayout, x, dx):
    """max alpha in [0,1] with x + alpha dx in the cone (pdip.py:55-85)."""
    xo, x1, x2 = lay.split(x)
    do, d1, d2 = lay.split(dx)
    if lay.n_ort:
        a = _ort_linesearch(xo, do)
    else:
        a = jnp.ones(x.shape[:-1], dtype=x.dtype)
    a = jnp.minimum(a, _soc_linesearch(x1, d1))
    a = jnp.minimum(a, _soc_linesearch(x2, d2))
    return a


# ---------------------------------------------------------------------------
# Feasibility shift
# ---------------------------------------------------------------------------

def bring2cone(lay: ConeLayout, r):
    """Shift r along the cone identity until strictly feasible
    (pdip.py:237-287)."""
    ro, r1, r2 = lay.split(r)
    a = jnp.full(r.shape[:-1], -jnp.inf, dtype=r.dtype)
    if lay.n_ort:
        a = jnp.maximum(a, -jnp.min(ro, axis=-1))
    if lay.s1:
        a = jnp.maximum(a, -(r1[..., 0] - jnp.linalg.norm(r1[..., 1:], axis=-1)))
    if lay.s2:
        a = jnp.maximum(a, -(r2[..., 0] - jnp.linalg.norm(r2[..., 1:], axis=-1)))
    e = gen_e(lay, r.dtype)
    shift = (1.0 + a)[..., None] * e
    return jnp.where((a < 0)[..., None], r, r + shift)


# ---------------------------------------------------------------------------
# Nesterov-Todd scaling
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class NTScaling:
    """w_ort: (..., n_ort); per SOC: eta (...,) and wbar (..., s) with
    wbar' J wbar = 1."""

    w_ort: jnp.ndarray
    eta1: jnp.ndarray
    wbar1: jnp.ndarray
    eta2: jnp.ndarray
    wbar2: jnp.ndarray


def _soc_nt(s, z):
    """(eta, wbar) for one SOC block (NT_scaling.py:340-405)."""
    if s.shape[-1] == 0:
        return jnp.ones(s.shape[:-1], dtype=s.dtype), s
    js = jnp.maximum(soc_quad(s), _TINY)
    jz = jnp.maximum(soc_quad(z), _TINY)
    sbar = s / jnp.sqrt(js)[..., None]
    zbar = z / jnp.sqrt(jz)[..., None]
    gamma = jnp.sqrt((1.0 + jnp.sum(sbar * zbar, axis=-1)) / 2.0)
    Jz = jnp.concatenate([zbar[..., :1], -zbar[..., 1:]], axis=-1)
    wbar = (sbar + Jz) / (2.0 * gamma[..., None])
    eta = (js / jz) ** 0.25
    return eta, wbar


def nt_scalings(lay: ConeLayout, s, z) -> NTScaling:
    so, s1, s2 = lay.split(s)
    zo, z1, z2 = lay.split(z)
    w_ort = jnp.sqrt(so / zo)
    eta1, wbar1 = _soc_nt(s1, z1)
    eta2, wbar2 = _soc_nt(s2, z2)
    return NTScaling(w_ort, eta1, wbar1, eta2, wbar2)


def _soc_apply(eta, wbar, v, inverse: bool):
    """eta*Wbar v (or its inverse) with
    Wbar = [[w0, w1'], [w1, I + w1 w1'/(1+w0)]];  Wbar^{-1} = J Wbar J."""
    w0 = wbar[..., :1]
    w1 = wbar[..., 1:]
    if v.shape[-1] == 0:
        return v
    sgn = -1.0 if inverse else 1.0
    v0 = v[..., :1]
    v1 = v[..., 1:]
    w1v1 = jnp.sum(w1 * v1, axis=-1, keepdims=True)
    head = w0 * v0 + sgn * w1v1
    tail = v1 + (sgn * v0 + w1v1 / (1.0 + w0)) * w1
    out = jnp.concatenate([head, tail], axis=-1)
    scale = eta[..., None]
    return out / scale if inverse else out * scale


def _soc_apply_mat(eta, wbar, M, inverse: bool):
    """Apply the SOC scaling to the rows-axis (-2) of a matrix block."""
    Mt = jnp.swapaxes(M, -1, -2)  # (..., cols, s)
    out = _soc_apply(eta[..., None], wbar[..., None, :], Mt, inverse)
    return jnp.swapaxes(out, -1, -2)


def nt_apply(lay: ConeLayout, W: NTScaling, v):
    """W v (multiply_nt_scaling_vector, NT_scaling.py:205-240)."""
    vo, v1, v2 = lay.split(v)
    return lay.join(
        W.w_ort * vo,
        _soc_apply(W.eta1, W.wbar1, v1, inverse=False),
        _soc_apply(W.eta2, W.wbar2, v2, inverse=False),
    )


def nt_solve(lay: ConeLayout, W: NTScaling, v):
    """W^{-1} v (solve_nt_scaling_vector, NT_scaling.py:75-126)."""
    vo, v1, v2 = lay.split(v)
    return lay.join(
        vo / W.w_ort,
        _soc_apply(W.eta1, W.wbar1, v1, inverse=True),
        _soc_apply(W.eta2, W.wbar2, v2, inverse=True),
    )


def nt_solve_mat(lay: ConeLayout, W: NTScaling, G):
    """W^{-1} G on the rows axis (-2): the reference loops columns
    (NT_scaling.py:164-202); here it is one fused broadcast."""
    n = lay.n_ort
    Go = G[..., :n, :] / W.w_ort[..., None]
    G1 = _soc_apply_mat(W.eta1, W.wbar1, G[..., n : n + lay.s1, :], inverse=True)
    G2 = _soc_apply_mat(W.eta2, W.wbar2, G[..., n + lay.s1 :, :], inverse=True)
    return jnp.concatenate([Go, G1, G2], axis=-2)
