"""Mesh sharding (virtual 8-device CPU), checkpoint/resume, and MPC tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from dcol_tpu.parallel import checkpoint
from dcol_tpu.parallel.batch import (perturb_scenarios, solve_batch,
                                     solve_batch_blocked)
from dcol_tpu.parallel.mesh import (scenario_mesh, solve_batch_sharded,
                                    summarize)
from dcol_tpu.solver import altro, mpc
from dcol_tpu.systems import piano_mover


def _small_problem():
    sys_, params, X0, U0, cfg = piano_mover.make_problem()
    return sys_, params, X0, U0, cfg


def test_sharded_solve_matches_unsharded():
    """8-way scenario sharding must be numerically identical to the local
    batch (determinism independent of sharding, SURVEY.md §7.4 item 6)."""
    assert jax.device_count() >= 8
    sys_, params, X0, U0, cfg = _small_problem()
    params_b, X0_b, U0_b = perturb_scenarios(
        params, X0, U0, n=8, seed=5, x0_sigma=0.05)

    local = solve_batch(sys_, params_b, cfg, X0_b, U0_b)
    mesh = scenario_mesh(jax.devices()[:8])
    sharded = solve_batch_sharded(sys_, mesh, params_b, cfg, X0_b, U0_b)

    assert bool(jnp.all(sharded.converged))
    np.testing.assert_allclose(np.asarray(sharded.X), np.asarray(local.X),
                               atol=1e-12)
    s = summarize(sharded)
    assert s["n_converged"] == 8 and s["n_failed"] == 0


def test_blocked_solve_matches_unblocked():
    """Block-sequential execution (lax.map over blocks) runs the same
    algorithm as the one-big-vmap batch — only the schedule differs
    (stragglers stop stalling other blocks).  Bitwise equality across batch
    shapes is NOT promised (XLA reassociates per shape), so this pins
    well-conditioned scenarios: same convergence, same iteration counts,
    same trajectories to solver tolerance."""
    sys_, params, X0, U0, cfg = _small_problem()
    params_b, X0_b, U0_b = perturb_scenarios(
        params, X0, U0, n=6, seed=5, x0_sigma=0.01)
    full = solve_batch(sys_, params_b, cfg, X0_b, U0_b)
    blocked = solve_batch_blocked(sys_, params_b, cfg, X0_b, U0_b, block=2)
    assert bool(jnp.all(full.converged))
    assert bool(jnp.all(blocked.converged))
    np.testing.assert_array_equal(np.asarray(blocked.iter),
                                  np.asarray(full.iter))
    np.testing.assert_allclose(np.asarray(blocked.X), np.asarray(full.X),
                               atol=1e-6)
    # non-divisible block is an explicit error, not silent truncation
    import pytest
    with pytest.raises(ValueError):
        solve_batch_blocked(sys_, params_b, cfg, X0_b, U0_b, block=4)


def test_checkpoint_roundtrip(tmp_path):
    sys_, params, X0, U0, cfg = _small_problem()
    st = altro.solve(sys_, params, cfg, X0, U0)
    path = os.path.join(tmp_path, "state.npz")
    checkpoint.save(path, st)
    st2 = checkpoint.load(path, like=st)
    np.testing.assert_array_equal(np.asarray(st.X), np.asarray(st2.X))
    np.testing.assert_array_equal(np.asarray(st.mux), np.asarray(st2.mux))
    assert int(st2.iter) == int(st.iter)


def test_checkpoint_roundtrip_no_template(tmp_path):
    """A real quadrotor state (warm = 7 per-group (x, s, z) triples, i.e. 21
    leaves — the structure the old flat fallback mis-assembled) round-trips
    WITHOUT a template: the index paths stored by save() rebuild the nested
    pytree exactly."""
    from dcol_tpu.systems import quadrotor

    sys_, params, X0, U0, cfg = quadrotor.make_problem(dtype=jnp.float32)
    st = jax.jit(lambda p, a, b: altro.make_initial_state(sys_, p, cfg, a, b)
                 )(params, X0, U0)
    path = os.path.join(tmp_path, "state.npz")
    checkpoint.save(path, st)
    st2 = checkpoint.load(path)  # no like=
    assert jax.tree_util.tree_structure(st2) == \
        jax.tree_util.tree_structure(st)
    for a, b in zip(jax.tree_util.tree_leaves(st),
                    jax.tree_util.tree_leaves(st2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_resume_continues(tmp_path):
    """A capped solve checkpointed and resumed reaches the same result as an
    uninterrupted solve."""
    sys_, params, X0, U0, cfg = _small_problem()
    import dataclasses

    cfg_short = dataclasses.replace(cfg, max_iters=10)
    st_partial = altro.solve(sys_, params, cfg_short, X0, U0)
    assert not bool(st_partial.converged)
    path = os.path.join(tmp_path, "partial.npz")
    checkpoint.save(path, st_partial)
    st_loaded = checkpoint.load(path, like=st_partial)

    # resume: keep iterating from the restored state
    step = jax.jit(lambda p, s: altro.altro_iteration(sys_, p, cfg, s))
    st = st_loaded
    for _ in range(60):
        st = step(params, st)
        if bool(st.converged):
            break
    assert bool(st.converged)

    st_full = altro.solve(sys_, params, cfg, X0, U0)
    np.testing.assert_allclose(np.asarray(st.X), np.asarray(st_full.X),
                               atol=1e-9)


def test_mpc_tracks_optimal_plan():
    """Noiseless MPC with converged warm-started ticks must follow the
    offline converged plan's pace: the closed-loop state at tick k stays
    close to the offline optimum's knot k (fixed-horizon regulation replans
    reproduce the optimal trajectory when undisturbed)."""
    import dataclasses

    sys_, params, X0, U0, cfg = _small_problem()
    st = altro.solve(sys_, params, cfg, X0, U0)  # offline optimum
    cfg_mpc = dataclasses.replace(cfg, max_iters=40)
    res = mpc.mpc_run(sys_, params, cfg_mpc, X0[0], U0, n_steps=25)
    assert bool(jnp.all(jnp.isfinite(res.X_applied)))
    err = np.linalg.norm(np.asarray(res.X_applied)[25, :2]
                         - np.asarray(st.X)[25, :2])
    assert float(err) < 0.3, err
    # and it is actually progressing toward the goal
    d0 = float(jnp.linalg.norm(X0[0][:2] - params["Xref"][-1][:2]))
    d1 = float(jnp.linalg.norm(res.X_applied[-1][:2]
                               - params["Xref"][-1][:2]))
    assert d1 < 0.6 * d0


def test_mpc_dual_warm_start_cuts_iterations():
    """Carrying the AL duals + penalty across ticks (carry_duals=True) must
    converge ticks in fewer ALTRO iterations than U-only warm starts, with a
    closed-loop trajectory at least as close to the goal."""
    import dataclasses

    sys_, params, X0, U0, cfg = _small_problem()
    cfg_mpc = dataclasses.replace(cfg, max_iters=40)
    warm = mpc.mpc_run(sys_, params, cfg_mpc, X0[0], U0, n_steps=12,
                       carry_duals=True)
    cold = mpc.mpc_run(sys_, params, cfg_mpc, X0[0], U0, n_steps=12,
                       carry_duals=False)
    # after the first tick (identical state, no duals to carry yet), the
    # dual-warm ticks must be cheaper on average
    it_warm = float(jnp.mean(warm.iters[1:]))
    it_cold = float(jnp.mean(cold.iters[1:]))
    assert it_warm < it_cold, (it_warm, it_cold)
    d_warm = float(jnp.linalg.norm(warm.X_applied[-1][:2]
                                   - params["Xref"][-1][:2]))
    d_cold = float(jnp.linalg.norm(cold.X_applied[-1][:2]
                                   - params["Xref"][-1][:2]))
    assert d_warm <= d_cold * 1.25 + 1e-3
    assert bool(jnp.all(jnp.isfinite(warm.X_applied)))


def test_mpc_receding_horizon_tracks_path():
    """xref_path slides the tracked reference window per tick (true receding
    horizon instead of fixed-goal regulation)."""
    import dataclasses

    sys_, params, X0, U0, cfg = _small_problem()
    n_steps = 10
    # straight-line reference path from start to goal, long enough to cover
    # every tick's horizon window
    T = n_steps + sys_.N
    a = np.linspace(0.0, 1.0, T)[:, None]
    path = jnp.asarray((1 - a) * np.asarray(X0[0]) +
                       a * np.asarray(params["Xref"][-1]))
    cfg_mpc = dataclasses.replace(cfg, max_iters=6)
    res = mpc.mpc_run(sys_, params, cfg_mpc, X0[0], U0, n_steps=n_steps,
                      xref_path=path)
    assert bool(jnp.all(jnp.isfinite(res.X_applied)))
    # the closed-loop trajectory should stay near the early reference path
    # (a sliding window tracks the path; fixed-goal regulation overshoots it)
    err = np.linalg.norm(np.asarray(res.X_applied)[1:, :2]
                         - np.asarray(path)[1:n_steps + 1, :2], axis=1)
    assert float(err.mean()) < 0.5, err


def test_solve_single_matches_batch_member():
    """solve_single (replicated-batch latency mode) returns exactly the
    single problem's solution: identical replicas run in lock-step, so every
    member — including member 0 — is the plain solve."""
    from dcol_tpu.parallel.batch import solve_single

    sys_, params, X0, U0, cfg = _small_problem()
    st_direct = altro.solve(sys_, params, cfg, X0, U0)
    st_single = solve_single(sys_, params, cfg, X0, U0, replicas=4)
    assert bool(st_single.converged) == bool(st_direct.converged)
    assert int(st_single.iter) == int(st_direct.iter)
    np.testing.assert_allclose(np.asarray(st_single.X),
                               np.asarray(st_direct.X), rtol=1e-9, atol=1e-11)
