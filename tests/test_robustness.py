"""NaN guards, per-member failure isolation, and sharding determinism.

SURVEY.md §5 directs the build toward ``jax_debug_nans``-style NaN checks and
deterministic-collective tests (the reference has nothing to race, but the
batched TPU solver must (a) never let one poisoned scenario contaminate its
batch neighbours, and (b) produce bitwise-identical results regardless of the
mesh layout the scenario batch is sharded over).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dcol_tpu.parallel.batch import perturb_scenarios, solve_batch
from dcol_tpu.parallel.mesh import scenario_mesh, solve_batch_sharded
from dcol_tpu.ops.pdip import solve_socp
from dcol_tpu.ops.pdip_pallas import solve_socp_pallas
from dcol_tpu.solver import altro
from dcol_tpu.systems import piano_mover
from tests.test_pdip_pallas import _padded_batch


def test_solve_outputs_nan_free_under_debug_nans():
    """The public solve path's outputs must be NaN-free even with JAX's NaN
    debugging armed (SURVEY.md §5 'race detection' row: jax_debug_nans)."""
    jax.config.update("jax_debug_nans", True)
    try:
        sys_, params, X0, U0, cfg = piano_mover.make_problem()
        cfg = dataclasses.replace(cfg, max_iters=40)
        st = altro.solve(sys_, params, cfg, X0, U0)
    finally:
        jax.config.update("jax_debug_nans", False)
    for leaf in jax.tree_util.tree_leaves(st):
        assert bool(jnp.all(jnp.isfinite(leaf))), leaf


def test_poisoned_member_does_not_contaminate_batch():
    """A NaN initial state must fail ONLY its own batch member; neighbours
    still converge to the same trajectories as in a clean batch."""
    sys_, params, X0, U0, cfg = piano_mover.make_problem()
    params_b, X0_b, U0_b = perturb_scenarios(
        params, X0, U0, n=4, seed=3, x0_sigma=0.03)
    clean = solve_batch(sys_, params_b, cfg, X0_b, U0_b)
    assert bool(jnp.all(clean.converged))

    X0_p = X0_b.at[2, 0, 0].set(jnp.nan)
    poisoned = solve_batch(sys_, params_b, cfg, X0_p, U0_b)
    conv = np.asarray(poisoned.converged)
    assert not conv[2]
    assert bool(poisoned.failed[2]) or not bool(poisoned.converged[2])
    for i in (0, 1, 3):
        assert conv[i]
        np.testing.assert_array_equal(np.asarray(poisoned.X[i]),
                                      np.asarray(clean.X[i]))


def test_pdip_nan_problem_isolated_both_backends():
    """A NaN pair problem inside a PDIP batch must not perturb the other
    members (lane independence of the pallas layout; vmap independence of the
    XLA path) and must come back converged=False, not raise."""
    c, G, h, lay, gold = _padded_batch()
    c_p = c.copy()
    c_p[1] = np.nan
    for solver, kw in ((solve_socp, {}),
                       (solve_socp_pallas, {"block": 128, "interpret": True})):
        ref = solver(c, G, h, lay, tol=1e-9, max_iters=40, **kw)
        out = solver(c_p, G, h, lay, tol=1e-9, max_iters=40, **kw)
        conv = np.asarray(out.converged)
        assert not conv[1]
        keep = np.array([i for i in range(c.shape[0]) if i != 1])
        np.testing.assert_array_equal(np.asarray(out.x)[keep],
                                      np.asarray(ref.x)[keep])
        np.testing.assert_allclose(np.asarray(out.x)[keep, 3], gold[keep],
                                   rtol=1e-6, atol=1e-8)


def test_sharding_layout_independence():
    """Mesh-layout independence at the level the solver can actually promise:
    every scenario converges on every layout, to the same optimum quality.

    Note bitwise equality across DIFFERENT layouts is not guaranteed — a
    2-device mesh tiles the per-device batch differently than local vmap, XLA
    may reassociate reductions, and a 1-ulp difference can flip a borderline
    line-search accept, after which iterate paths diverge (both still
    converge).  Same-layout bitwise determinism IS guaranteed (next test);
    8-device-vs-local numeric identity is pinned in
    test_parallel.py::test_sharded_solve_matches_unsharded."""
    assert jax.device_count() >= 8
    sys_, params, X0, U0, cfg = piano_mover.make_problem()
    params_b, X0_b, U0_b = perturb_scenarios(
        params, X0, U0, n=8, seed=5, x0_sigma=0.05)
    local = solve_batch(sys_, params_b, cfg, X0_b, U0_b)
    assert bool(jnp.all(local.converged))
    for n_dev in (2, 4, 8):
        mesh = scenario_mesh(jax.devices()[:n_dev])
        sharded = solve_batch_sharded(sys_, mesh, params_b, cfg, X0_b, U0_b)
        assert bool(jnp.all(sharded.converged)), n_dev
        # same optimum: converged costs and final states agree to solver
        # tolerance even where iterate paths diverged
        np.testing.assert_allclose(np.asarray(sharded.J),
                                   np.asarray(local.J), rtol=1e-3)
        np.testing.assert_allclose(np.asarray(sharded.X)[:, -1],
                                   np.asarray(local.X)[:, -1], atol=1e-3)


def test_sharded_solve_run_to_run_deterministic():
    """Two identical sharded runs are bitwise identical (no nondeterministic
    reductions anywhere in the solve)."""
    assert jax.device_count() >= 8
    sys_, params, X0, U0, cfg = piano_mover.make_problem()
    params_b, X0_b, U0_b = perturb_scenarios(
        params, X0, U0, n=8, seed=13, x0_sigma=0.04)
    mesh = scenario_mesh(jax.devices()[:8])
    a = solve_batch_sharded(sys_, mesh, params_b, cfg, X0_b, U0_b)
    b = solve_batch_sharded(sys_, mesh, params_b, cfg, X0_b, U0_b)
    for la, lb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
