"""Obstacle-kind grouping: exact per-group layouts must reproduce the
per-pair proximity values in the ORIGINAL obstacle order (the scene solves
groups contiguously and un-permutes the columns)."""

import jax
import jax.numpy as jnp
import numpy as np

from dcol_tpu.geometry import assembly
from dcol_tpu.geometry import primitives as prim
from dcol_tpu.ops.proximity import proximity
from dcol_tpu.systems.base import CollisionScene, ProximityOptions


def _mixed_scene():
    # deliberately INTERLEAVED kinds so grouped order != obstacle order
    robot = prim.sphere(0.3)
    obstacles = (
        prim.sphere(0.8),               # group A
        prim.rect_prism(1.0, 2.0, 0.5), # group B
        prim.sphere(0.5),               # group A again
        prim.capsule(0.2, 1.5),         # group C
        prim.rect_prism(0.7, 0.7, 0.7), # group B again
    )
    scene = CollisionScene(robot, obstacles, ProximityOptions(1e-8, 40))
    obs_r = jnp.asarray(np.array([
        [2.0, 0.0, 0.0], [0.0, 3.0, 0.5], [-2.5, 1.0, 0.0],
        [1.0, -2.0, 1.0], [0.5, 0.5, -3.0]]))
    obs_p = jnp.asarray(np.array([
        [0.0, 0.0, 0.0], [0.1, -0.2, 0.05], [0.0, 0.0, 0.0],
        [0.3, 0.1, 0.0], [-0.1, 0.2, 0.1]]))
    return scene, obs_r, obs_p


def test_groups_partition_and_layouts():
    scene, _, _ = _mixed_scene()
    groups = scene.groups
    assert [idx for _, idx in groups] == [(0, 2), (1, 4), (3,)]
    # grouped-order -> obstacle-order permutation round-trips
    order = scene.group_order
    inv = scene.inv_perm
    assert [order[i] for i in inv] == list(range(scene.n_obs))
    # exact layouts: no box rows, no vacuous SOC blocks
    lay_ss = groups[0][0]   # sphere-sphere: two real SOC(4), no orthant
    assert (lay_ss.n_ort, lay_ss.s1, lay_ss.s2, lay_ss.nv) == (0, 4, 4, 4)
    lay_sp = groups[1][0]   # sphere-polytope(6): orthant + one SOC
    assert (lay_sp.n_ort, lay_sp.s1, lay_sp.s2, lay_sp.nv) == (6, 4, 0, 4)


def test_grouped_alphas_match_per_pair():
    scene, obs_r, obs_p = _mixed_scene()
    rs = jnp.asarray(np.array([[0.0, 0.0, 0.0], [0.5, 0.2, -0.1]]))
    ps = jnp.asarray(np.array([[0.0, 0.0, 0.0], [0.05, -0.1, 0.2]]))
    a, warm = scene.alphas_traj(rs, ps, obs_r, obs_p)
    assert a.shape == (2, scene.n_obs)
    for t in range(2):
        for i, obs in enumerate(scene.obstacles):
            ref = proximity(scene.robot, obs, rs[t], ps[t],
                            obs_r[i], obs_p[i], tol=1e-10, max_iters=50)
            np.testing.assert_allclose(a[t, i], ref.alpha, rtol=1e-6,
                                       err_msg=f"t={t} obs={i}")
    # warm restart reproduces the same values (one triple per group)
    assert len(warm) == len(scene.groups)
    a2, _ = scene.alphas_traj(rs, ps, obs_r, obs_p, warm=warm)
    np.testing.assert_allclose(a, a2, rtol=1e-5)


def test_grouped_envelope_grads_match_fd():
    scene, obs_r, obs_p = _mixed_scene()
    rs = jnp.asarray(np.array([[0.1, -0.2, 0.3]]))
    ps = jnp.asarray(np.array([[0.02, 0.05, -0.04]]))
    a, d_r, d_p, _ = scene.alphas_and_grads_traj(rs, ps, obs_r, obs_p)
    eps = 1e-6
    for j in range(3):
        e = jnp.zeros(3).at[j].set(eps)
        ap, _ = scene.alphas_traj(rs + e, ps, obs_r, obs_p)
        am, _ = scene.alphas_traj(rs - e, ps, obs_r, obs_p)
        np.testing.assert_allclose(d_r[0, :, j], (ap - am)[0] / (2 * eps),
                                   rtol=2e-3, atol=2e-5)
        ap, _ = scene.alphas_traj(rs, ps + e, obs_r, obs_p)
        am, _ = scene.alphas_traj(rs, ps - e, obs_r, obs_p)
        np.testing.assert_allclose(d_p[0, :, j], (ap - am)[0] / (2 * eps),
                                   rtol=2e-3, atol=2e-5)


def test_merge_groups_matches_exact_groups():
    """Latency mode (one merged padded kernel launch) must reproduce the
    exact-grouped values and gradients: the padding is provably equivalent
    (assembly.py module docstring)."""
    import dataclasses

    scene, obs_r, obs_p = _mixed_scene()
    merged = dataclasses.replace(
        scene, opts=dataclasses.replace(scene.opts, merge_groups=True))
    assert len(merged.groups) == 1
    assert merged.groups[0][1] == tuple(range(scene.n_obs))
    rs = jnp.asarray(np.array([[0.0, 0.0, 0.0], [0.5, 0.2, -0.1]]))
    ps = jnp.asarray(np.array([[0.0, 0.0, 0.0], [0.05, -0.1, 0.2]]))
    a, _ = scene.alphas_traj(rs, ps, obs_r, obs_p)
    am, warm_m = merged.alphas_traj(rs, ps, obs_r, obs_p)
    np.testing.assert_allclose(am, a, rtol=1e-6, atol=1e-8)
    # warm restart round-trips in merged mode too
    am2, _ = merged.alphas_traj(rs, ps, obs_r, obs_p, warm=warm_m)
    np.testing.assert_allclose(am2, a, rtol=1e-5, atol=1e-7)
    # envelope gradients agree to the same level as FD (the gradient error
    # scales with the duals' distance-to-optimum ~ sqrt(tol), and the two
    # layouts stop at different iterates within that ball)
    _, d_r, d_p, _ = scene.alphas_and_grads_traj(rs, ps, obs_r, obs_p)
    _, d_rm, d_pm, _ = merged.alphas_and_grads_traj(rs, ps, obs_r, obs_p)
    np.testing.assert_allclose(d_rm, d_r, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(d_pm, d_p, rtol=2e-3, atol=2e-4)


def test_exact_layout_alpha_equals_padded():
    robot = prim.cone(1.5, np.deg2rad(30))
    obs = prim.cylinder(0.6, 2.0)
    r1 = jnp.asarray(np.array([0.0, 0.0, 0.0]))
    p1 = jnp.asarray(np.array([0.1, 0.0, -0.05]))
    r2 = jnp.asarray(np.array([1.8, 0.4, 0.2]))
    p2 = jnp.asarray(np.array([0.0, 0.2, 0.0]))
    # padded one-size-fits-all layout (box rows + vacuous fill + SOC tails)
    nv, n_ort = assembly.scene_dims(robot, [obs])
    pad_pl = assembly.make_layout(robot, obs, nv + 1, n_ort + 3)
    from dcol_tpu.ops.cones import ConeLayout
    from dcol_tpu.ops.pdip import solve_socp
    c, G, h = assembly.assemble_pair(robot, obs, pad_pl, r1, p1, r2, p2)
    sol = solve_socp(c[None], G[None], h[None],
                     ConeLayout(pad_pl.n_ort, pad_pl.s1, pad_pl.s2),
                     tol=1e-10, max_iters=50)
    a_pad = sol.x[0, 3]
    ref = proximity(robot, obs, r1, p1, r2, p2, tol=1e-10, max_iters=50)
    np.testing.assert_allclose(a_pad, ref.alpha, rtol=1e-7)
