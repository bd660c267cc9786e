"""Pallas PDIP kernel (interpret mode on CPU) vs. the XLA solver and
reference goldens."""

import numpy as np
import jax.numpy as jnp

from dcol_tpu.geometry import assembly
from dcol_tpu.ops.cones import ConeLayout
from dcol_tpu.ops.pdip import solve_socp
from dcol_tpu.ops.pdip_pallas import solve_socp_pallas
from tests.test_geometry import golden_shapes, load


def _padded_batch():
    """Heterogeneous golden pairs padded to one unified shape."""
    shapes = golden_shapes()
    cases = [c for c in load("pairs.json")]
    robot_kinds = {c["k1"] for c in cases}
    # use the sphere-robot subset (one unified scene layout)
    cases = [c for c in cases if c["k1"] == "sphere"]
    robot = shapes["sphere"]
    obs = [shapes[c["k2"]] for c in cases]
    nv, n_ort = assembly.scene_dims(robot, obs)
    lay = ConeLayout(n_ort, assembly.S_PAD, assembly.S_PAD)
    Cs, Gs, Hs, alphas = [], [], [], []
    for c_case, o in zip(cases, obs):
        lp = assembly.make_layout(robot, o, nv, n_ort)
        c, G, h = assembly.assemble_pair(
            robot, o, lp,
            np.array(c_case["r1"]), np.array(c_case["p1"]),
            np.array(c_case["r2"]), np.array(c_case["p2"]))
        Cs.append(np.asarray(c)); Gs.append(np.asarray(G))
        Hs.append(np.asarray(h)); alphas.append(c_case["alpha"])
    return (np.stack(Cs), np.stack(Gs), np.stack(Hs), lay,
            np.asarray(alphas))


def test_pallas_matches_xla_and_golden_f64():
    c, G, h, lay, gold = _padded_batch()
    ref = solve_socp(c, G, h, lay, tol=1e-9, max_iters=40)
    out = solve_socp_pallas(c, G, h, lay, tol=1e-9, max_iters=40,
                            block=128, interpret=True)
    assert bool(np.all(out.converged))
    np.testing.assert_allclose(np.asarray(out.x[:, 3]), gold,
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                               rtol=1e-5, atol=1e-7)


def test_pallas_f32():
    c, G, h, lay, gold = _padded_batch()
    out = solve_socp_pallas(c.astype(np.float32), G.astype(np.float32),
                            h.astype(np.float32), lay, tol=2e-5,
                            max_iters=40, jitter=1e-6, block=128,
                            interpret=True)
    assert bool(np.all(out.converged))
    np.testing.assert_allclose(np.asarray(out.x[:, 3]), gold,
                               rtol=2e-3, atol=2e-3)


def test_pallas_multi_tile():
    """Batch larger than one lane tile (grid > 1) and non-multiple sizes."""
    c, G, h, lay, gold = _padded_batch()
    reps = 50  # 5 problems -> 250 > 128
    cb = np.tile(c, (reps, 1))
    Gb = np.tile(G, (reps, 1, 1))
    hb = np.tile(h, (reps, 1))
    out = solve_socp_pallas(cb, Gb, hb, lay, tol=1e-9, max_iters=40,
                            block=128, interpret=True)
    assert bool(np.all(out.converged))
    np.testing.assert_allclose(np.asarray(out.x[:, 3]),
                               np.tile(gold, reps), rtol=1e-6, atol=1e-8)


def test_pallas_warm_start():
    """Warm-started re-solve of perturbed problems converges in fewer
    iterations to the same solution (both backends)."""
    c, G, h, lay, gold = _padded_batch()
    cold = solve_socp_pallas(c, G, h, lay, tol=1e-9, max_iters=40,
                             block=128, interpret=True)
    Gp = G * (1.0 + 1e-3)
    hp = h * (1.0 + 1e-3)
    cold2 = solve_socp_pallas(c, Gp, hp, lay, tol=1e-9, max_iters=40,
                              block=128, interpret=True)
    warm2 = solve_socp_pallas(c, Gp, hp, lay, tol=1e-9, max_iters=40,
                              block=128, interpret=True,
                              warm=(cold.x, cold.s, cold.z))
    assert bool(np.all(warm2.converged))
    np.testing.assert_allclose(np.asarray(warm2.x[:, 3]),
                               np.asarray(cold2.x[:, 3]), rtol=1e-6, atol=1e-7)
    assert float(np.mean(np.asarray(warm2.iters))) < float(
        np.mean(np.asarray(cold2.iters)))

    # xla backend agrees
    xw = solve_socp(c, Gp, hp, lay, tol=1e-9, max_iters=40,
                    warm=(cold.x, cold.s, cold.z))
    assert bool(np.all(xw.converged))
    np.testing.assert_allclose(np.asarray(xw.x[:, 3]),
                               np.asarray(cold2.x[:, 3]), rtol=1e-6, atol=1e-7)
