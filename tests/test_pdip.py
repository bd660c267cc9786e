"""Batched PDIP solver vs. reference golden solutions (tests/goldens/pairs.json).

Validates three paths:
  1. solving the reference's own (c, G, h) with its exact cone layout,
  2. solving our padded assembly of the same pair (alpha must agree),
  3. batch-of-N consistency: the batched solve equals per-problem solves.
"""

import json
import os

import numpy as np
import pytest

from dcol_tpu.geometry import assembly
from dcol_tpu.ops.cones import ConeLayout
from dcol_tpu.ops.pdip import solve_socp
from tests.test_geometry import golden_shapes, load

GOLD = os.path.join(os.path.dirname(__file__), "goldens")


def ref_cases():
    return load("pairs.json")


@pytest.mark.parametrize("i", range(len(json.load(open(os.path.join(GOLD, "pairs.json"))))))
def test_reference_problems_exact_layout(i):
    """Solve the reference's combined problem directly (no padding)."""
    case = ref_cases()[i]
    lay = ConeLayout(case["n_ort"], case["n_soc1"], case["n_soc2"])
    c = np.array(case["c"])
    G = np.array(case["G"])
    h = np.array(case["h"])
    sol = solve_socp(c, G, h, lay, tol=1e-9, max_iters=40)
    assert bool(sol.converged), (case["k1"], case["k2"])
    np.testing.assert_allclose(
        float(sol.x[3]), case["alpha"], rtol=1e-6, atol=1e-7,
        err_msg=f"{case['k1']} vs {case['k2']}")


def test_padded_problems_match_alpha():
    """Padded assembly + one unified layout reproduces every golden alpha."""
    shapes = golden_shapes()
    cases = ref_cases()
    for case in cases:
        s1, s2 = shapes[case["k1"]], shapes[case["k2"]]
        nv, n_ort = assembly.scene_dims(s1, [s2])
        laypair = assembly.make_layout(s1, s2, nv, n_ort)
        c, G, h = assembly.assemble_pair(
            s1, s2, laypair,
            np.array(case["r1"]), np.array(case["p1"]),
            np.array(case["r2"]), np.array(case["p2"]))
        lay = ConeLayout(n_ort, assembly.S_PAD, assembly.S_PAD)
        sol = solve_socp(np.asarray(c), np.asarray(G), np.asarray(h), lay,
                         tol=1e-9, max_iters=40)
        assert bool(sol.converged), (case["k1"], case["k2"])
        np.testing.assert_allclose(
            float(sol.x[3]), case["alpha"], rtol=1e-6, atol=1e-7,
            err_msg=f"{case['k1']} vs {case['k2']}")
        # contact point agrees too
        np.testing.assert_allclose(
            np.asarray(sol.x[:3]), np.array(case["x"])[:3], rtol=1e-4, atol=1e-5,
            err_msg=f"{case['k1']} vs {case['k2']}")


def test_batched_equals_single():
    """One unified-shape batch over heterogeneous pairs == per-pair solves."""
    shapes = golden_shapes()
    cases = ref_cases()
    robot = shapes["sphere"]
    obs = [shapes[c["k2"]] for c in cases if c["k1"] == "sphere"]
    sphere_cases = [c for c in cases if c["k1"] == "sphere"]
    nv, n_ort = assembly.scene_dims(robot, obs)
    lay = ConeLayout(n_ort, assembly.S_PAD, assembly.S_PAD)

    Cs, Gs, Hs, singles = [], [], [], []
    for c_case, o in zip(sphere_cases, obs):
        lp = assembly.make_layout(robot, o, nv, n_ort)
        c, G, h = assembly.assemble_pair(
            robot, o, lp,
            np.array(c_case["r1"]), np.array(c_case["p1"]),
            np.array(c_case["r2"]), np.array(c_case["p2"]))
        Cs.append(np.asarray(c)); Gs.append(np.asarray(G)); Hs.append(np.asarray(h))
        singles.append(float(solve_socp(np.asarray(c), np.asarray(G),
                                        np.asarray(h), lay, tol=1e-9,
                                        max_iters=40).x[3]))
    batch = solve_socp(np.stack(Cs), np.stack(Gs), np.stack(Hs), lay,
                       tol=1e-9, max_iters=40)
    assert bool(np.all(batch.converged))
    np.testing.assert_allclose(np.asarray(batch.x[:, 3]), singles, rtol=1e-12)


def test_f32_padded_solve():
    """The f32 path (TPU default) converges to mu<1e-5 and matches golden
    alpha to ~1e-4."""
    shapes = golden_shapes()
    for case in ref_cases()[:8]:
        s1, s2 = shapes[case["k1"]], shapes[case["k2"]]
        nv, n_ort = assembly.scene_dims(s1, [s2])
        lp = assembly.make_layout(s1, s2, nv, n_ort)
        c, G, h = assembly.assemble_pair(
            s1, s2, lp,
            np.array(case["r1"]), np.array(case["p1"]),
            np.array(case["r2"]), np.array(case["p2"]))
        lay = ConeLayout(n_ort, assembly.S_PAD, assembly.S_PAD)
        sol = solve_socp(np.asarray(c, np.float32), np.asarray(G, np.float32),
                         np.asarray(h, np.float32), lay, tol=1e-5,
                         max_iters=40, jitter=1e-6)
        assert bool(sol.converged), (case["k1"], case["k2"])
        np.testing.assert_allclose(float(sol.x[3]), case["alpha"],
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"{case['k1']} vs {case['k2']}")


def test_skip_mask_zero_iterations():
    """skip-flagged members enter the loop done: zero iterations, output =
    the initial/warm iterate; unskipped members are unaffected bitwise."""
    import jax.numpy as jnp

    case = ref_cases()[0]
    lay = ConeLayout(case["n_ort"], case["n_soc1"], case["n_soc2"])
    c = np.tile(np.array(case["c"])[None], (4, 1))
    G = np.tile(np.array(case["G"])[None], (4, 1, 1))
    h = np.tile(np.array(case["h"])[None], (4, 1))
    base = solve_socp(c, G, h, lay, tol=1e-9, max_iters=40)
    warm = (base.x, base.s, base.z)

    skip = jnp.asarray([False, True, False, True])
    sol = solve_socp(c, G, h, lay, tol=1e-9, max_iters=40, warm=warm,
                     skip=skip)
    # skipped members: zero iterations, x untouched (= the warm x)
    assert int(sol.iters[1]) == 0 and int(sol.iters[3]) == 0
    np.testing.assert_array_equal(np.asarray(sol.x[1]), np.asarray(base.x[1]))
    # unskipped members re-solve exactly as a skip-free warm call would
    ref = solve_socp(c, G, h, lay, tol=1e-9, max_iters=40, warm=warm)
    np.testing.assert_array_equal(np.asarray(sol.x[0]), np.asarray(ref.x[0]))
    np.testing.assert_array_equal(np.asarray(sol.z[2]), np.asarray(ref.z[2]))

    # all-skipped: the while_loop exits immediately
    sol_all = solve_socp(c, G, h, lay, tol=1e-9, max_iters=40, warm=warm,
                         skip=jnp.ones(4, bool))
    assert int(np.max(np.asarray(sol_all.iters))) == 0

    # pallas backend (interpret mode on CPU): same semantics
    from dcol_tpu.ops.pdip_pallas import solve_socp_pallas

    solp = solve_socp_pallas(
        jnp.asarray(c, jnp.float32), jnp.asarray(G, jnp.float32),
        jnp.asarray(h, jnp.float32), lay, tol=1e-4, max_iters=40,
        warm=tuple(jnp.asarray(w, jnp.float32) for w in warm),
        skip=skip, interpret=True)
    assert int(solp.iters[1]) == 0 and int(solp.iters[3]) == 0
    np.testing.assert_allclose(np.asarray(solp.x[1]),
                               np.asarray(base.x[1]).astype(np.float32),
                               rtol=1e-6)
