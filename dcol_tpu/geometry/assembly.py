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


# ---------------------------------------------------------------------------
# Entry-wise assembly (batch-minor / kernel-tile layout)
# ---------------------------------------------------------------------------
#
# The dense `assemble_pair` materialises (T, nr, nv) problem matrices in
# knot-major layout (concatenates pin it), which the Pallas wrapper must then
# TRANSPOSE to its batch-on-lanes tile layout — measured at ~3 ms per
# batch-64 constraint call, dwarfing the PDIP math itself (docs/PROFILE.md
# round-5c).  The entry-wise path below computes each (row, col) entry of
# G/h as ONE scalar over the pose batch (python float where the entry is
# pose-independent), so the caller can stack rows directly into the kernel's
# (nv*nr, tiles, 128) operand with no transpose and no dense intermediate.
# The arithmetic mirrors `prim_blocks`/`assemble_pair` formula-for-formula.

def dcm_entries(p):
    """3x3 nested list of DCM entries for MRP ``p`` with arbitrary leading
    batch dims (same closed form as :func:`~dcol_tpu.geometry.mrp.dcm_from_mrp`,
    entry-wise: nothing (3, 3)-shaped is materialised)."""
    px, py, pz = p[..., 0], p[..., 1], p[..., 2]
    pp = px * px + py * py + pz * pz
    inv_den = 1.0 / ((1.0 + pp) ** 2)
    c4 = 4.0 * (1.0 - pp)
    # S = skew(p); SS = p p' - pp I
    Q = [[None] * 3 for _ in range(3)]
    pv = (px, py, pz)
    S = ((0.0, -pz, py), (pz, 0.0, -px), (-py, px, 0.0))
    for i in range(3):
        for j in range(3):
            ss = pv[i] * pv[j] - (pp if i == j else 0.0)
            s = S[i][j]
            num = 8.0 * ss if isinstance(s, float) else 8.0 * ss + c4 * s
            Q[i][j] = (1.0 if i == j else 0.0) + num * inv_den
    return Q


def _world_pose_entries(shape: prim.Shape, r, p):
    """(r_w [3 scalars], Q [3][3] scalars) with the rigid-body offset applied;
    identity/zero offsets skip the transform (cf. :func:`_world_pose`)."""
    Q = dcm_entries(p)
    rw = [r[..., 0], r[..., 1], r[..., 2]]
    r_off = np.asarray(shape.r_offset, dtype=np.float64)
    Q_off = np.asarray(shape.Q_offset, dtype=np.float64)
    if not np.allclose(r_off, 0.0):
        rw = [rw[i] + sum(Q[i][k] * float(r_off[k]) for k in range(3)
                          if r_off[k] != 0.0) for i in range(3)]
    if not np.allclose(Q_off, np.eye(3)):
        Q = [[sum(Q[i][k] * float(Q_off[k, j]) for k in range(3)
                  if Q_off[k, j] != 0.0) for j in range(3)]
             for i in range(3)]
    return rw, Q


def prim_block_entries(shape: prim.Shape, r, p):
    """Entry-wise :func:`prim_blocks`: (ort_rows, soc_rows), each row a
    ``(cols, h)`` pair with ``cols`` a list of ``shape.n_vars`` entries.
    Entries are python floats where pose-independent, else scalars carrying
    the pose's batch dims."""
    rw, Q = _world_pose_entries(shape, r, p)
    k = shape.kind

    if k == prim.POLYTOPE:
        A = shape.A_np()
        b = shape.b_np()
        ort = []
        for i in range(A.shape[0]):
            aq = [sum(float(A[i, j]) * Q[c][j] for j in range(3)
                      if A[i, j] != 0.0) for c in range(3)]
            h = sum(aq[c] * rw[c] for c in range(3))
            ort.append((aq + [-float(b[i])], h))
        return ort, []

    if k == prim.SPHERE:
        soc = [([0.0, 0.0, 0.0, -float(shape.R)], 0.0)]
        for i in range(3):
            cols = [0.0] * 4
            cols[i] = -1.0
            soc.append((cols, -rw[i]))
        return [], soc

    if k == prim.CONE:
        tb = float(np.tan(shape.beta))
        d = (tb, 1.0, 1.0)
        # EQt[i][j] = d_i * Q[j][i]
        lc = (-tb * 3.0 * shape.H / 4.0, 0.0, 0.0)
        soc = []
        for i in range(3):
            eq = [d[i] * Q[j][i] for j in range(3)]
            soc.append(([-e for e in eq] + [float(lc[i])],
                        -sum(eq[j] * rw[j] for j in range(3))))
        bx = [Q[j][0] for j in range(3)]
        ort = [(bx + [-shape.H / 4.0], sum(bx[j] * rw[j] for j in range(3)))]
        return ort, soc

    if k == prim.CAPSULE or k == prim.CYLINDER:
        bx = [Q[j][0] for j in range(3)]
        soc = [([0.0, 0.0, 0.0, -float(shape.R), 0.0], 0.0)]
        for i in range(3):
            cols = [0.0] * 5
            cols[i] = -1.0
            cols[4] = bx[i]
            soc.append((cols, -rw[i]))
        hl = shape.L / 2.0
        ort = [([0.0, 0.0, 0.0, -hl, 1.0], 0.0),
               ([0.0, 0.0, 0.0, -hl, -1.0], 0.0)]
        if k == prim.CYLINDER:
            bxr = bx[0] * rw[0] + bx[1] * rw[1] + bx[2] * rw[2]
            ort.append(([-bx[0], -bx[1], -bx[2], -hl, 0.0], -bxr))
            ort.append(([bx[0], bx[1], bx[2], -hl, 0.0], bxr))
        return ort, soc

    if k == prim.ELLIPSOID:
        P2 = shape.A_np()
        soc = [([0.0, 0.0, 0.0, -1.0], 0.0)]
        for i in range(3):
            pq = [sum(float(P2[i, j]) * Q[c][j] for j in range(3)
                      if P2[i, j] != 0.0) for c in range(3)]
            soc.append(([-q for q in pq] + [0.0],
                        -sum(pq[c] * rw[c] for c in range(3))))
        return [], soc

    if k == prim.POLYGON:
        A = shape.A_np()
        b = shape.b_np()
        ort = [([0.0, 0.0, 0.0, -float(b[i]), float(A[i, 0]),
                 float(A[i, 1])], 0.0) for i in range(A.shape[0])]
        soc = [([0.0, 0.0, 0.0, -float(shape.R), 0.0, 0.0], 0.0)]
        for i in range(3):
            cols = [0.0] * 6
            cols[i] = -1.0
            cols[4] = Q[i][0]
            cols[5] = Q[i][1]
            soc.append((cols, -rw[i]))
        return ort, soc

    raise ValueError(f"unknown primitive kind {k!r}")


def assemble_pair_entries(s1: prim.Shape, s2: prim.Shape, layout: PairLayout,
                          r1, p1, r2, p2):
    """Entry-wise :func:`assemble_pair`: returns ``(c_cols, rows)`` with
    ``c_cols`` the (static) objective column list and ``rows`` the
    ``layout.nr`` rows ``(cols, h)`` in [orthant; soc1; soc2] order — same
    semantics, no dense (nr, nv) materialisation."""
    o1, s1r = prim_block_entries(s1, r1, p1)
    o2, s2r = prim_block_entries(s2, r2, p2)
    L = layout
    nv = L.nv

    def embed(cols, which):
        out = [0.0] * nv
        out[:4] = cols[:4]
        extras = cols[4:]
        if which == 1:
            out[4:4 + len(extras)] = extras
        else:
            out[L.v1:L.v1 + len(extras)] = extras
        return out

    rows = [(embed(c, 1), h) for c, h in o1] + [(embed(c, 2), h)
                                                for c, h in o2]
    for j in range(L.v, nv):
        e = [0.0] * nv
        e[j] = 1.0
        ne = [0.0] * nv
        ne[j] = -1.0
        rows += [(e, 1.0), (ne, 1.0)]
    n_fill = L.n_ort - (L.n_ort1 + L.n_ort2 + L.n_box)
    rows += [([0.0] * nv, 1.0)] * n_fill

    def soc_rows(blk, which, true_dim, pad_dim):
        if pad_dim == 0:
            return []
        if true_dim == 0:
            return ([([0.0] * nv, 1.0)]
                    + [([0.0] * nv, 0.0)] * (pad_dim - 1))
        out = [(embed(c, which), h) for c, h in blk]
        out += [([0.0] * nv, 0.0)] * (pad_dim - true_dim)
        return out

    rows += soc_rows(s1r, 1, L.soc1, L.s1)
    rows += soc_rows(s2r, 2, L.soc2, L.s2)
    assert len(rows) == L.nr, (len(rows), L)
    c_cols = [0.0] * nv
    c_cols[3] = 1.0
    return c_cols, rows
