"""On-device (real TPU) parity check: pallas PDIP kernel vs the XLA solver.

The pytest suite exercises the pallas kernel in interpret mode only (tests
must not run on the TPU path — CLAUDE.md), so this script is the committed
on-device evidence: for every system's scene it assembles the grouped pair
problems along the reference trajectory, solves them COLD with both backends
on the TPU, and compares alphas (x[3]) and convergence.

Writes docs/artifacts/pallas_parity_tpu.json and prints it.

Usage:  python tools/check_pallas_parity.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def check_system(name, make_problem, dtype):
    from dcol_tpu.ops.cones import ConeLayout
    from dcol_tpu.ops.pdip import solve_socp
    from dcol_tpu.ops.pdip_pallas import solve_socp_pallas

    sys_, params, X0, U0, cfg = make_problem(dtype=dtype)
    scene = sys_.scene
    rs, ps = jax.vmap(sys_.robot_pose)(params["Xref"])

    @jax.jit
    def assemble(rs, ps):
        return jax.vmap(lambda r, p: scene.assemble_groups(
            r, p, params["obs_r"], params["obs_p"]))(rs, ps)

    grouped = assemble(rs, ps)
    rows = []
    for gi, (lay, idx) in enumerate(scene.groups):
        c, G, h = grouped[gi]
        B = c.shape[0] * c.shape[1]
        cf = c.reshape(B, -1)
        Gf = G.reshape(B, *G.shape[2:])
        hf = h.reshape(B, -1)
        cl = ConeLayout(lay.n_ort, lay.s1, lay.s2)
        kw = dict(tol=scene.opts.tol, max_iters=scene.opts.max_iters,
                  jitter=scene.opts.jitter)
        sp = jax.jit(lambda c_, G_, h_: solve_socp_pallas(c_, G_, h_, cl, **kw))
        sx = jax.jit(lambda c_, G_, h_: solve_socp(c_, G_, h_, cl, **kw))
        op = sp(cf, Gf, hf)
        ox = sx(cf, Gf, hf)
        ap, cvp, ax, cvx = jax.device_get(
            (op.x[:, 3], op.converged, ox.x[:, 3], ox.converged))
        both = cvp & cvx
        rows.append({
            "group": gi, "layout": f"ort={lay.n_ort} soc=({lay.s1},{lay.s2})",
            "pairs": int(B),
            "pallas_converged": int(cvp.sum()), "xla_converged": int(cvx.sum()),
            "max_abs_alpha_diff_converged": float(
                np.max(np.abs(ap - ax)[both])) if both.any() else None,
        })
    return rows


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    from dcol_tpu.systems import cone_through_wall, piano_mover, quadrotor

    report = {"device": str(dev), "dtype": "float32", "systems": {}}
    for name, mp in [("piano_mover", piano_mover.make_problem),
                     ("quadrotor", quadrotor.make_problem),
                     ("coneThroughWall", cone_through_wall.make_problem)]:
        rows = check_system(name, mp, jnp.float32)
        report["systems"][name] = rows
        print(f"{name}: {rows}", file=sys.stderr)

    diffs = [r["max_abs_alpha_diff_converged"]
             for rows in report["systems"].values() for r in rows
             if r["max_abs_alpha_diff_converged"] is not None]
    report["max_abs_alpha_diff_overall"] = float(max(diffs))
    # both backends run the same algorithm in f32 at tol 2e-5; agreement is
    # expected at ~solver-tolerance level
    report["pass"] = report["max_abs_alpha_diff_overall"] < 5e-4
    # A few pairs per group may report unconverged on COLD f32 starts (both
    # backends; mu plateaus just above tol within the iteration budget).
    # This is benign in-solve: the ALTRO hot path warm-starts every
    # constraint batch from the previous converged solution at a nearby
    # trajectory (AltroState.warm invariant), under which these members
    # converge in 1-4 iterations; cold starts occur once, at
    # make_initial_state.  Parity is judged on both-converged pairs.
    report["note"] = (
        "cold-start f32 stress test; unconverged pairs are rescued by the "
        "solver's warm-start path (see tools/check_pallas_parity.py)")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "artifacts",
        "pallas_parity_tpu.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
