"""Geometry layer vs. golden values generated from the reference
(/root/reference, via tools/gen_goldens.py)."""

import json
import os

import numpy as np
import pytest

from dcol_tpu.geometry import assembly, primitives as prim
from dcol_tpu.geometry.mrp import dcm_from_mrp, mrp_from_quat

GOLD = os.path.join(os.path.dirname(__file__), "goldens")


def load(name):
    with open(os.path.join(GOLD, name)) as f:
        return json.load(f)


def golden_shapes():
    """Shapes matching tools/gen_goldens.py make_prims()."""
    A, b = prim.n_sided_polygon(5, 0.6)
    return {
        "polytope": prim.rect_prism(2.5, 0.15, 0.01),
        "sphere": prim.sphere(0.8),
        "cone": prim.cone(2.0, np.deg2rad(22)),
        "capsule": prim.capsule(0.2, 5.0),
        "cylinder": prim.cylinder(0.6, 3.0),
        "polygon": prim.polygon(A, b, 0.2),
    }


def test_dcm_matches_reference():
    for case in load("mrp.json"):
        ours = np.asarray(dcm_from_mrp(np.array(case["p"])))
        np.testing.assert_allclose(ours, np.array(case["dcm"]), atol=1e-12)


def test_mrp_from_quat():
    q = np.array([np.cos(np.pi / 4), np.sin(np.pi / 4), 0, 0])
    np.testing.assert_allclose(
        np.asarray(mrp_from_quat(q)),
        np.array([np.sin(np.pi / 4) / (1 + np.cos(np.pi / 4)), 0, 0]),
    )


@pytest.mark.parametrize(
    "kind", [k for k in prim.EXTRA_VARS if k != prim.ELLIPSOID])
def test_prim_blocks_match_reference(kind):  # no ellipsoid golden: the
    # reference never implemented it (covered by test_ellipsoid_primitive)
    shapes = golden_shapes()
    gold = load("prim_blocks.json")[kind]
    G_ort, h_ort, G_soc, h_soc = assembly.prim_blocks(
        shapes[kind], np.array(gold["r"]), np.array(gold["p"])
    )
    want_ort = np.array(gold["G_ort"])
    if want_ort.size == 0:
        assert np.asarray(G_ort).shape[0] == 0
    else:
        np.testing.assert_allclose(np.asarray(G_ort), want_ort, atol=1e-12)
        np.testing.assert_allclose(np.asarray(h_ort), np.array(gold["h_ort"]), atol=1e-12)
    got_soc = np.asarray(G_soc)
    want_soc = np.array(gold["G_soc"])
    if want_soc.size == 0:
        assert got_soc.shape[0] == 0
    else:
        np.testing.assert_allclose(got_soc, want_soc, atol=1e-12)
        np.testing.assert_allclose(np.asarray(h_soc), np.array(gold["h_soc"]), atol=1e-12)


def test_padded_pair_matches_reference_rows():
    """The padded (c, G, h) restricted to real rows/cols equals the reference
    combined problem, and padding rows are exactly the documented vacuous /
    box / SOC-tail constraints."""
    shapes = golden_shapes()
    for case in load("pairs.json"):
        s1, s2 = shapes[case["k1"]], shapes[case["k2"]]
        nv, n_ort = assembly.scene_dims(s1, [s2])
        lay = assembly.make_layout(s1, s2, nv, n_ort)
        c, G, h = assembly.assemble_pair(
            s1, s2, lay,
            np.array(case["r1"]), np.array(case["p1"]),
            np.array(case["r2"]), np.array(case["p2"]),
        )
        c, G, h = np.asarray(c), np.asarray(G), np.asarray(h)
        Gr, hr = np.array(case["G"]), np.array(case["h"])
        v = lay.v
        n12 = lay.n_ort1 + lay.n_ort2

        # real orthant rows
        np.testing.assert_allclose(G[:n12, :v], Gr[: case["n_ort"]], atol=1e-12)
        np.testing.assert_allclose(h[:n12], hr[: case["n_ort"]], atol=1e-12)
        # no real content in padded columns of real rows
        np.testing.assert_allclose(G[:n12, v:], 0.0, atol=0)

        # SOC rows: reference stacks soc1 then soc2 after the orthant rows
        r = case["n_ort"]
        if lay.soc1:
            np.testing.assert_allclose(
                G[n_ort : n_ort + lay.soc1, :v], Gr[r : r + lay.soc1], atol=1e-12)
            np.testing.assert_allclose(h[n_ort : n_ort + lay.soc1],
                                       hr[r : r + lay.soc1], atol=1e-12)
            r += lay.soc1
        if lay.soc2:
            base = n_ort + assembly.S_PAD
            np.testing.assert_allclose(
                G[base : base + lay.soc2, :v], Gr[r : r + lay.soc2], atol=1e-12)
            np.testing.assert_allclose(h[base : base + lay.soc2],
                                       hr[r : r + lay.soc2], atol=1e-12)

        # objective: minimise alpha
        assert c[3] == 1.0 and np.count_nonzero(c) == 1

        # padding rows: SOC tails are all-zero; vacuous rows have h = 1
        if lay.soc1:
            np.testing.assert_allclose(G[n_ort + lay.soc1 : n_ort + assembly.S_PAD], 0.0)
        fill0 = n12 + lay.n_box
        np.testing.assert_allclose(G[fill0:n_ort], 0.0)
        np.testing.assert_allclose(h[fill0:n_ort], 1.0)


def test_case4_pair_assembles():
    """Pairs where both primitives carry extra variables (broken in the
    reference, combine_problem_matrices.py:58-67) assemble fine here."""
    shapes = golden_shapes()
    for k1 in ("capsule", "cylinder", "polygon"):
        for k2 in ("capsule", "cylinder", "polygon"):
            s1, s2 = shapes[k1], shapes[k2]
            nv, n_ort = assembly.scene_dims(s1, [s2])
            lay = assembly.make_layout(s1, s2, nv, n_ort)
            c, G, h = assembly.assemble_pair(
                s1, s2, lay, np.zeros(3), np.zeros(3),
                np.array([3.0, 0, 0]), np.zeros(3))
            assert G.shape == (lay.nr, nv)
            assert np.all(np.isfinite(np.asarray(G)))


def test_ellipsoid_primitive():
    """Ellipsoid (extension beyond the reference Python): a ball-shaped
    ellipsoid must reproduce sphere proximity exactly; squashing an axis
    changes alpha in the right direction."""
    from dcol_tpu.ops.proximity import proximity

    sph = prim.sphere(0.8)
    ell = prim.ellipsoid(0.8, 0.8, 0.8)
    obs = prim.sphere(0.5)
    r1, p1 = np.zeros(3), np.zeros(3)
    r2, p2 = np.array([3.0, 0.0, 0.0]), np.zeros(3)
    a_s = float(proximity(sph, obs, r1, p1, r2, p2, tol=1e-10, max_iters=40).alpha)
    a_e = float(proximity(ell, obs, r1, p1, r2, p2, tol=1e-10, max_iters=40).alpha)
    np.testing.assert_allclose(a_e, a_s, rtol=1e-7)
    # analytic: touching when 0.8*a + 0.5*a = 3 -> a = 3/1.3
    np.testing.assert_allclose(a_s, 3.0 / 1.3, rtol=1e-6)

    # squash along x: smaller x-semi-axis -> larger alpha needed to touch
    ell2 = prim.ellipsoid(0.4, 0.8, 0.8)
    a_e2 = float(proximity(ell2, obs, r1, p1, r2, p2, tol=1e-10, max_iters=40).alpha)
    np.testing.assert_allclose(a_e2, 3.0 / 0.9, rtol=1e-6)

    # gradient flows through ellipsoid poses too
    import jax
    import jax.numpy as jnp
    from dcol_tpu.ops.proximity import proximity_alpha

    g = jax.grad(lambda r: proximity_alpha(ell2, obs, r, p1, r2, p2,
                                           tol=1e-10, max_iters=40))(jnp.asarray(r1))
    assert float(g[0]) < 0  # moving +x toward the obstacle reduces alpha


def test_tiled_assembly_matches_dense():
    """The entry-wise tile-layout assembly (assemble_groups_tiled — the
    pallas hot path, docs/PROFILE.md round-5c) must reproduce the dense
    assemble_groups + batch-to-lanes transpose to machine precision for all
    three systems' scenes."""
    import jax
    import jax.numpy as jnp

    from dcol_tpu.ops.pdip_pallas import tile_dims
    from dcol_tpu.systems import cone_through_wall, piano_mover, quadrotor

    for mod in (quadrotor, piano_mover, cone_through_wall):
        sys_, params, X0, U0, cfg = mod.make_problem(dtype=jnp.float64)
        scene = sys_.scene
        X = X0 + 0.01 * jnp.arange(sys_.N)[:, None]
        rs, ps = jax.vmap(sys_.robot_pose)(X)
        obs_r, obs_p = params["obs_r"], params["obs_p"]
        T = rs.shape[0]
        tiled = scene.assemble_groups_tiled(rs, ps, obs_r, obs_p)
        dense = jax.vmap(
            lambda r, p: scene.assemble_groups(r, p, obs_r, obs_p))(rs, ps)
        for gi, (lay, idx) in enumerate(scene.groups):
            c, G, h = dense[gi]
            n_g = len(idx)
            B = T * n_g
            _, Bp = tile_dims(B, scene.opts.block)

            def to_tiles(a):
                a = jnp.moveaxis(a.reshape((B,) + a.shape[2:]), 0, -1)
                pad = Bp - B
                if pad:
                    a = jnp.concatenate(
                        [a, jnp.repeat(a[..., -1:], pad, -1)], -1)
                return a.reshape((-1, Bp // 128, 128))

            refs = (to_tiles(c), to_tiles(jnp.swapaxes(G, -1, -2)),
                    to_tiles(h))
            clt, Glt, hlt, B2 = tiled[gi]
            assert B2 == B
            for a, b in zip((clt, Glt, hlt), refs):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=1e-13)
