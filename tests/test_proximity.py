"""Envelope gradients vs. reference finite-difference goldens, plus
custom_vjp / vmap consistency."""

import numpy as np
import jax
import jax.numpy as jnp

from dcol_tpu.ops.proximity import (
    pair_layouts, proximity, proximity_alpha, proximity_with_grad)
from tests.test_geometry import golden_shapes, load


def test_alpha_and_envelope_grad_match_reference():
    shapes = golden_shapes()
    for case in load("pairs.json"):
        s1, s2 = shapes[case["k1"]], shapes[case["k2"]]
        r1, p1 = np.array(case["r1"]), np.array(case["p1"])
        r2, p2 = np.array(case["r2"]), np.array(case["p2"])
        res, grads = proximity_with_grad(
            s1, s2, r1, p1, r2, p2, argnums=(0, 1, 2, 3),
            tol=1e-10, max_iters=40)
        assert bool(res.converged)
        np.testing.assert_allclose(float(res.alpha), case["alpha"],
                                   rtol=1e-6, atol=1e-8)
        got = np.concatenate([np.asarray(g) for g in grads])
        want = np.array(case["grad"])  # FD with eps ~1.5e-8 -> ~1e-6 error
        np.testing.assert_allclose(
            got, want, rtol=2e-4, atol=5e-5,
            err_msg=f"{case['k1']} vs {case['k2']}")


def test_custom_vjp_matches_direct_grad():
    shapes = golden_shapes()
    case = load("pairs.json")[3]
    s1, s2 = shapes[case["k1"]], shapes[case["k2"]]
    r1, p1 = jnp.array(case["r1"]), jnp.array(case["p1"])
    r2, p2 = jnp.array(case["r2"]), jnp.array(case["p2"])

    f = lambda r1_, p1_: proximity_alpha(s1, s2, r1_, p1_, r2, p2,
                                         tol=1e-10, max_iters=40)
    g_r1, g_p1 = jax.grad(lambda a, b: f(a, b), argnums=(0, 1))(r1, p1)
    _, grads = proximity_with_grad(s1, s2, r1, p1, r2, p2, argnums=(0, 1),
                                   tol=1e-10, max_iters=40)
    np.testing.assert_allclose(np.asarray(g_r1), np.asarray(grads[0]), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g_p1), np.asarray(grads[1]), rtol=1e-9)


def test_vmap_over_poses():
    """Batched proximity over robot poses equals scalar path (vmap-of-1 and
    vmap-of-N; SURVEY.md §4 oracle (e))."""
    shapes = golden_shapes()
    s1, s2 = shapes["sphere"], shapes["cylinder"]
    layouts = pair_layouts(s1, s2)
    rng = np.random.default_rng(7)
    r1 = rng.standard_normal((16, 3)) * 1.5
    p1 = rng.standard_normal((16, 3)) * 0.3
    r2 = np.array([3.0, 0.5, 0.2])
    p2 = np.array([0.1, -0.2, 0.3])

    batched = proximity(s1, s2, r1, p1, r2[None].repeat(16, 0),
                        p2[None].repeat(16, 0), layouts=layouts, tol=1e-9,
                        max_iters=40)
    assert bool(np.all(batched.converged))
    for i in range(0, 16, 5):
        single = proximity(s1, s2, r1[i], p1[i], r2, p2, layouts=layouts,
                           tol=1e-9, max_iters=40)
        np.testing.assert_allclose(float(batched.alpha[i]),
                                   float(single.alpha), rtol=1e-12)

    # grad batches too, through vmap of the custom_vjp
    f = lambda a, b: proximity_alpha(s1, s2, a, b, r2, p2, layouts=layouts,
                                     tol=1e-9, max_iters=40)
    gv = jax.vmap(jax.grad(f, argnums=0))(jnp.asarray(r1), jnp.asarray(p1))
    g0 = jax.grad(f, argnums=0)(jnp.asarray(r1[0]), jnp.asarray(p1[0]))
    np.testing.assert_allclose(np.asarray(gv[0]), np.asarray(g0), rtol=1e-8)
