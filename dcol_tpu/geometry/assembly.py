"""Assembly of per-primitive-pair SOCP problem matrices with static layouts:
EXACT minimal layouts per pair kind (:func:`exact_layout` — the hot path;
pairs grouped by layout batch with zero padding rows) or one padded shape
covering every pair type of a scene (:func:`make_layout` defaults).

Reference semantics (re-derived, not translated):
  * per-primitive blocks: ``primitives/problem_matrices.py:4-209`` — each
    primitive contributes orthant rows ``G_ort x <= h_ort`` and (for smooth
    shapes) one second-order-cone block ``h_soc - G_soc x in SOC``.
  * pair combination: ``primitives/combine_problem_matrices.py:3-70`` — stack
    both primitives' blocks over the shared decision vector
    ``x = [contact(3); alpha; extras1; extras2]`` and minimise ``alpha``.

TPU-first deviation: instead of the reference's five shape-dependent layouts,
every pair is *exactly* embedded into one static layout
``(NV columns, N_ORT orthant rows, two SOC blocks of S rows)`` using padding
that provably does not change the optimiser:

  * SOC tail padding: a d-dim SOC embeds in an S-dim SOC by pinning the extra
    coordinates to zero (zero G rows, zero h) — membership is equivalent.
  * absent SOC block: the vacuous constraint ``0 x + s = e1, s in SOC`` is
    always strictly feasible and decoupled from ``x``.
  * padded decision columns get a pair of box rows ``±x_j <= 1`` (keeps
    ``G^T G`` nonsingular; the flat objective drives interior-point iterates
    to the analytic centre ``x_j = 0``).
  * leftover orthant rows are the vacuous ``0 x <= 1``.

All padding rows are *real* constraints of an equivalent SOCP, so the solver
needs no masking and the duals of padded rows vanish, leaving the envelope
gradient untouched.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from dcol_tpu.geometry import primitives as prim
from dcol_tpu.geometry.mrp import dcm_from_mrp

S_PAD = 4  # padded SOC block size (max over kinds; see primitives.SOC_DIM)


# ---------------------------------------------------------------------------
# Per-primitive blocks (local column convention: [contact(3); alpha; extras])
# ---------------------------------------------------------------------------

# Tiny (<=14 x 3) matmuls are written elementwise: XLA:TPU lowers small
# dot_generals to padded MXU ops, which is the dominant cost of the hot
# vmapped assembly/jacfwd paths (see mrp.py and the round-3 A-B-A note).

def _mmT(A, Q):
    """A @ Q.T without dot_general: A (n, 3), Q (3, 3) -> (n, 3)."""
    return sum(A[..., k:k + 1] * Q[..., None, :, k] for k in range(3))


def _mv(A, v):
    """A @ v without dot_general: A (n, 3), v (3,) -> (n,)."""
    return sum(A[..., :, k] * v[..., None, k] for k in range(3))


def _world_pose(shape: prim.Shape, r, p):
    """Apply the rigid body offset: world rotation and position of the shape.
    Identity/zero offsets (the common case) are detected statically and skip
    the transform entirely."""
    Q = dcm_from_mrp(p)
    r_off = np.asarray(shape.r_offset, dtype=np.float64)
    Q_off = np.asarray(shape.Q_offset, dtype=np.float64)
    if np.allclose(r_off, 0.0):
        r_w = r
    else:
        ro = jnp.asarray(shape.r_offset, dtype=r.dtype)
        r_w = r + sum(Q[..., :, k] * ro[k] for k in range(3))
    if np.allclose(Q_off, np.eye(3)):
        Q_w = Q
    else:
        Qo = jnp.asarray(shape.Q_offset, dtype=r.dtype)
        Q_w = sum(Q[..., :, k:k + 1] * Qo[k, None, :] for k in range(3))
    return r_w, Q_w


def prim_blocks(shape: prim.Shape, r, p):
    """(G_ort, h_ort, G_soc, h_soc) for one primitive at pose (r, p).

    Shapes are static per kind: G_ort (n_ort, v), G_soc (n_soc, v) with
    v = 4 + extra vars.  Mirrors ``problem_matrices.py:255-364`` dispatch.
    """
    r = jnp.asarray(r)
    p = jnp.asarray(p)
    dt = r.dtype
    rw, Q = _world_pose(shape, r, p)
    k = shape.kind

    if k == prim.POLYTOPE:
        A = jnp.asarray(shape.A_np(), dtype=dt)
        b = jnp.asarray(shape.b_np(), dtype=dt)
        AQt = _mmT(A, Q)
        G_ort = jnp.concatenate([AQt, -b[:, None]], axis=1)
        h_ort = _mv(AQt, rw)
        G_soc = jnp.zeros((0, 4), dtype=dt)
        h_soc = jnp.zeros((0,), dtype=dt)
        return G_ort, h_ort, G_soc, h_soc

    if k == prim.SPHERE:
        G_ort = jnp.zeros((0, 4), dtype=dt)
        h_ort = jnp.zeros((0,), dtype=dt)
        top = jnp.array([[0.0, 0.0, 0.0, -shape.R]], dtype=dt)
        bot = jnp.concatenate([-jnp.eye(3, dtype=dt), jnp.zeros((3, 1), dtype=dt)], axis=1)
        G_soc = jnp.concatenate([top, bot], axis=0)
        h_soc = jnp.concatenate([jnp.zeros((1,), dtype=dt), -rw])
        return G_ort, h_ort, G_soc, h_soc

    if k == prim.CONE:
        tb = np.tan(shape.beta)
        bx = Q[:, 0]
        # E @ Q.T with E = diag([tan b, 1, 1]) is a row scale of Q.T
        EQt = jnp.array([tb, 1.0, 1.0], dtype=dt)[:, None] * Q.T
        h_soc = -_mv(EQt, rw)
        last_col = -jnp.array([tb * 3.0 * shape.H / 4.0, 0.0, 0.0], dtype=dt)[:, None]
        G_soc = jnp.concatenate([-EQt, last_col], axis=1)
        G_ort = jnp.concatenate([bx, jnp.array([-shape.H / 4.0], dtype=dt)])[None, :]
        h_ort = jnp.sum(bx * rw)[None]
        return G_ort, h_ort, G_soc, h_soc

    if k == prim.CAPSULE or k == prim.CYLINDER:
        bx = Q[:, 0]
        top = jnp.array([[0.0, 0.0, 0.0, -shape.R, 0.0]], dtype=dt)
        bot = jnp.concatenate(
            [-jnp.eye(3, dtype=dt), jnp.zeros((3, 1), dtype=dt), bx[:, None]], axis=1
        )
        G_soc = jnp.concatenate([top, bot], axis=0)
        h_soc = jnp.concatenate([jnp.zeros((1,), dtype=dt), -rw])
        hl = shape.L / 2.0
        cap_rows = jnp.array(
            [[0.0, 0.0, 0.0, -hl, 1.0], [0.0, 0.0, 0.0, -hl, -1.0]], dtype=dt
        )
        if k == prim.CAPSULE:
            G_ort = cap_rows
            h_ort = jnp.zeros((2,), dtype=dt)
        else:  # cylinder adds the two axial end-plane rows
            r3 = jnp.concatenate([-bx, jnp.array([-hl, 0.0], dtype=dt)])[None, :]
            r4 = jnp.concatenate([bx, jnp.array([-hl, 0.0], dtype=dt)])[None, :]
            G_ort = jnp.concatenate([cap_rows, r3, r4], axis=0)
            bxr = jnp.sum(bx * rw)
            h_ort = jnp.stack([jnp.zeros((), dt), jnp.zeros((), dt), -bxr, bxr])
        return G_ort, h_ort, G_soc, h_soc

    if k == prim.ELLIPSOID:
        # ||P^(1/2) Q'(y - r)|| <= alpha:  s = h - Gx in SOC(4) with
        # G = [[0 0 0 -1], [-P2 Q', 0]], h = [0; -P2 Q' r]  (analogue of the
        # sphere block; the Julia DCOL primitive absent from the reference)
        P2 = jnp.asarray(shape.A_np(), dtype=dt)
        G_ort = jnp.zeros((0, 4), dtype=dt)
        h_ort = jnp.zeros((0,), dtype=dt)
        PQt = _mmT(P2, Q)
        top = jnp.array([[0.0, 0.0, 0.0, -1.0]], dtype=dt)
        bot = jnp.concatenate([-PQt, jnp.zeros((3, 1), dtype=dt)], axis=1)
        G_soc = jnp.concatenate([top, bot], axis=0)
        h_soc = jnp.concatenate([jnp.zeros((1,), dtype=dt), -_mv(PQt, rw)])
        return G_ort, h_ort, G_soc, h_soc

    if k == prim.POLYGON:
        A = jnp.asarray(shape.A_np(), dtype=dt)  # (nf, 2)
        b = jnp.asarray(shape.b_np(), dtype=dt)
        nf = A.shape[0]
        G_ort = jnp.concatenate([jnp.zeros((nf, 3), dtype=dt), -b[:, None], A], axis=1)
        h_ort = jnp.zeros((nf,), dtype=dt)
        Qt2 = Q[:, :2]
        top = jnp.array([[0.0, 0.0, 0.0, -shape.R, 0.0, 0.0]], dtype=dt)
        bot = jnp.concatenate(
            [-jnp.eye(3, dtype=dt), jnp.zeros((3, 1), dtype=dt), Qt2], axis=1
        )
        G_soc = jnp.concatenate([top, bot], axis=0)
        h_soc = jnp.concatenate([jnp.zeros((1,), dtype=dt), -rw])
        return G_ort, h_ort, G_soc, h_soc

    raise ValueError(f"unknown primitive kind {k!r}")


# ---------------------------------------------------------------------------
# Pair layout + padded assembly
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PairLayout:
    """Static layout of one primitive pair inside the padded problem.

    ``s1``/``s2`` are the PADDED SOC block sizes; the default (``S_PAD``
    each, even when a primitive has no SOC — a vacuous block is emitted)
    gives the one-layout-covers-everything scheme.  Exact per-kind layouts
    (:func:`exact_layout`) instead set them to the true SOC dims (possibly
    0 = no block), which the solvers also accept — pair problems grouped by
    kind then carry zero padding rows."""

    n_ort1: int
    n_ort2: int
    v1: int
    v2: int
    soc1: int  # true SOC dims (0 if the primitive has no SOC block)
    soc2: int
    nv: int    # padded number of decision variables
    n_ort: int # padded number of orthant rows
    s1: int = S_PAD  # padded SOC block sizes (0 = block absent)
    s2: int = S_PAD

    @property
    def v(self) -> int:
        return self.v1 + self.v2 - 4

    @property
    def n_box(self) -> int:
        return 2 * (self.nv - self.v)

    @property
    def nr(self) -> int:
        return self.n_ort + self.s1 + self.s2


def pair_min_dims(s1: prim.Shape, s2: prim.Shape) -> Tuple[int, int]:
    """(min decision vars, min orthant rows incl. box rows at that nv)."""
    v = s1.n_vars + s2.n_vars - 4
    return v, s1.n_ort + s2.n_ort


def make_layout(s1: prim.Shape, s2: prim.Shape, nv: int, n_ort: int,
                s1_pad: int = S_PAD, s2_pad: int = S_PAD) -> PairLayout:
    lay = PairLayout(
        n_ort1=s1.n_ort, n_ort2=s2.n_ort, v1=s1.n_vars, v2=s2.n_vars,
        soc1=s1.n_soc, soc2=s2.n_soc, nv=nv, n_ort=n_ort,
        s1=s1_pad, s2=s2_pad,
    )
    assert lay.v <= nv, (lay, nv)
    assert lay.n_ort1 + lay.n_ort2 + lay.n_box <= n_ort, (lay, n_ort)
    assert lay.soc1 <= lay.s1 and lay.soc2 <= lay.s2, lay
    return lay


def exact_layout(s1: prim.Shape, s2: prim.Shape) -> PairLayout:
    """Minimal zero-padding layout for one pair: exact decision vars, exact
    orthant rows (no box / vacuous fill), exact SOC dims (absent blocks are
    dropped, not made vacuous).  Pairs sharing a layout can be solved as one
    batch; :class:`~dcol_tpu.systems.base.CollisionScene` groups obstacles by
    this key."""
    v, rows = pair_min_dims(s1, s2)
    return make_layout(s1, s2, v, rows, s1_pad=s1.n_soc, s2_pad=s2.n_soc)


def scene_dims(robot: prim.Shape, obstacles: Sequence[prim.Shape]) -> Tuple[int, int]:
    """Unified (NV, N_ORT) covering every robot-obstacle pair of a scene."""
    nv = max(pair_min_dims(robot, o)[0] for o in obstacles)
    n_ort = 0
    for o in obstacles:
        v, rows = pair_min_dims(robot, o)
        n_ort = max(n_ort, rows + 2 * (nv - v))
    return nv, n_ort


def assemble_pair(s1: prim.Shape, s2: prim.Shape, layout: PairLayout,
                  r1, p1, r2, p2):
    """Padded (c, G, h) for the pair SOCP:  min c'x  s.t.  Gx + s = h, s in K.

    K = R^{n_ort}_+  x  SOC(layout.s1)  x  SOC(layout.s2), with zero-size
    blocks dropped.  Differentiable in all four pose arguments; static output
    shapes (nr, nv).
    """
    G1o, h1o, G1s, h1s = prim_blocks(s1, r1, p1)
    G2o, h2o, G2s, h2s = prim_blocks(s2, r2, p2)
    dt = G1o.dtype if G1o.size else G1s.dtype
    L = layout
    nv, n_ort = L.nv, L.n_ort

    def embed_cols(B, which: int):
        """Map a block's local columns into the padded column layout."""
        if B.shape[0] == 0:
            return jnp.zeros((0, nv), dtype=dt)
        out = jnp.zeros((B.shape[0], nv), dtype=dt)
        out = out.at[:, :4].set(B[:, :4])
        if which == 1 and L.v1 > 4:
            out = out.at[:, 4:L.v1].set(B[:, 4:])
        if which == 2 and L.v2 > 4:
            out = out.at[:, L.v1:L.v].set(B[:, 4:])
        return out

    # --- orthant rows ---------------------------------------------------
    rows = [embed_cols(G1o, 1), embed_cols(G2o, 2)]
    hs = [h1o, h2o]
    # box rows for padded decision columns: +/- x_j <= 1
    for j in range(L.v, nv):
        e = jnp.zeros((1, nv), dtype=dt).at[0, j].set(1.0)
        rows += [e, -e]
        hs += [jnp.ones((1,), dtype=dt), jnp.ones((1,), dtype=dt)]
    # vacuous fill rows: 0 x <= 1
    n_fill = n_ort - (L.n_ort1 + L.n_ort2 + L.n_box)
    if n_fill:
        rows.append(jnp.zeros((n_fill, nv), dtype=dt))
        hs.append(jnp.ones((n_fill,), dtype=dt))

    # --- SOC blocks -----------------------------------------------------
    def soc_block(Gs, hsv, which: int, true_dim: int, pad_dim: int):
        if pad_dim == 0:  # block absent from the layout entirely
            return None
        if true_dim == 0:  # vacuous SOC: 0 x + s = e1
            return (jnp.zeros((pad_dim, nv), dtype=dt),
                    jnp.zeros((pad_dim,), dtype=dt).at[0].set(1.0))
        Ge = embed_cols(Gs, which)
        Gp = jnp.concatenate(
            [Ge, jnp.zeros((pad_dim - true_dim, nv), dtype=dt)], axis=0)
        hp = jnp.concatenate([hsv, jnp.zeros((pad_dim - true_dim,), dtype=dt)])
        return Gp, hp

    for blk in (soc_block(G1s, h1s, 1, L.soc1, L.s1),
                soc_block(G2s, h2s, 2, L.soc2, L.s2)):
        if blk is not None:
            rows.append(blk[0])
            hs.append(blk[1])

    G = jnp.concatenate(rows, axis=0)
    h = jnp.concatenate(hs)
    c = jnp.zeros((nv,), dtype=dt).at[3].set(1.0)
    return c, G, h
