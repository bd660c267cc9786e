"""Smoke tests for plots, viz, and metrics utilities (host-side)."""

import os

import jax.numpy as jnp
import numpy as np

from dcol_tpu.solver import altro
from dcol_tpu.systems import piano_mover, quadrotor
from dcol_tpu.utils import metrics, plots, viz


def test_plots_and_viz_piano(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    sys_, params, X0, U0, cfg = piano_mover.make_problem()
    st = altro.solve(sys_, params, cfg, X0, U0)
    plots.plot_all("piano_mover", sys_, st)
    viz.visualize_scene("piano_mover", sys_, params, st)
    out = os.path.join(tmp_path, "result_images", "piano_mover")
    for f in ["regularization.png", "constraint_violations.png",
              "trajectories.png", "scene_topdown.png"]:
        assert os.path.exists(os.path.join(out, f)), f
    assert os.path.exists(os.path.join(out, "costs", "cost.png"))

    table = metrics.iteration_table(st)
    assert "iter" in table and len(table.splitlines()) == int(st.iter) + 2


def test_per_constraint_violation_plots(tmp_path, monkeypatch):
    """Per-constraint violation-history curves (reference utils/plots.py:
    288-322 parity — dead code there, live here)."""
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(1)
    hx_hist = rng.normal(size=(15, 3))  # 15 iterations, 3 state constraints
    hu_hist = rng.normal(size=(15, 6))
    plots.plot_per_constraint_violations("piano_mover", hx_hist, hu_hist)
    d = os.path.join(tmp_path, "result_images", "piano_mover")
    assert os.path.exists(os.path.join(d, "state_constraints.png"))
    assert os.path.exists(os.path.join(d, "control_constraints.png"))


def test_viz_3d_all_primitives(tmp_path, monkeypatch):
    """The 3-D renderer draws every primitive kind in the quadrotor scene."""
    monkeypatch.chdir(tmp_path)
    sys_, params, X0, U0, cfg = quadrotor.make_problem(N=10)
    X = np.tile(np.asarray(X0[0]), (10, 1))
    for view in ("side_az_90", "top_down", "custom"):
        viz.visualize_scene_3d("quadrotor", sys_, params, X, view_mode=view)
        assert os.path.exists(os.path.join(
            tmp_path, "result_images", "quadrotor", f"scene_{view}.png"))


def test_polytope_vertex_enumeration():
    from dcol_tpu.geometry import primitives as prim

    shape = prim.rect_prism(2.0, 4.0, 6.0)
    V = viz.polytope_vertices(shape.A_np(), shape.b_np())
    assert V.shape == (8, 3)
    np.testing.assert_allclose(np.abs(V).max(axis=0), [1.0, 2.0, 3.0])


def test_trajectory_history_plots(tmp_path, monkeypatch):
    """Per-iteration trajectory history plots (reference utils/plots.py:76-286
    parity): four state panels + per-system control splits for all three
    systems, written every 10 iterations + final."""
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    cases = {
        "piano_mover": (6, 3, ["linear_acceleration", "angular_acceleration"]),
        "quadrotor": (12, 4, ["control_trajectories"]),
        "coneThroughWall": (12, 6, ["forces", "torques"]),
    }
    for system, (nx, nu, control_stems) in cases.items():
        hist = [(rng.normal(size=(20, nx)), rng.normal(size=(19, nu)))
                for _ in range(12)]
        plots.plot_history(system, hist, dt=0.1, every=10)
        d = os.path.join(tmp_path, "result_images", system)
        for it in (0, 10, 11):  # every 10th + final
            for stem in ["position", "velocity", "orientation",
                         "angular_velocity"]:
                f = os.path.join(d, "state_trajectories_history",
                                 f"{stem}_iter_{it}.png")
                assert os.path.exists(f), f
            for stem in control_stems:
                f = os.path.join(d, "control_trajectories_history",
                                 f"{stem}_iter_{it}.png")
                assert os.path.exists(f), f
        # NOT written for in-between iterations
        assert not os.path.exists(os.path.join(
            d, "state_trajectories_history", "position_iter_5.png"))


def test_solve_verbose_callback_captures_history():
    """solve_verbose invokes the host callback once per iteration with the
    current state (the history-capture hook used by main.py)."""
    import dataclasses

    sys_, params, X0, U0, cfg = piano_mover.make_problem()
    cfg = dataclasses.replace(cfg, max_iters=3)
    seen = []
    st = altro.solve_verbose(sys_, params, cfg, X0, U0, print_table=False,
                             callback=lambda itr, s: seen.append(
                                 (itr, np.asarray(s.X))))
    assert [i for i, _ in seen] == [0, 1, 2]
    np.testing.assert_array_equal(seen[-1][1], np.asarray(st.X))


def test_mrp_to_euler_roundtrip():
    p = np.array([0.0, 0.0, np.tan(np.deg2rad(90) / 4)])  # yaw 90
    euler = plots.mrp_to_euler(p)
    np.testing.assert_allclose(np.rad2deg(euler), [0, 0, 90], atol=1e-9)
