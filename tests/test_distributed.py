"""Real multi-PROCESS distributed run (jax.distributed over localhost DCN):
two coordinated CPU processes, each owning 2 virtual devices and feeding 2
scenarios of a 4-scenario global sharded solve — the same code path a
multi-host TPU pod uses (SURVEY.md §2.2 communication-backend row), minus
the hardware.  Results must agree with an in-process solve of the same batch
and across both processes' metric reductions."""

import dataclasses
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_solve(tmp_path):
    port = _free_port()
    outs = [str(tmp_path / f"worker{i}.json") for i in range(2)]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own 2-device flag
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_REPO, "tests",
                                          "_distributed_worker.py"),
             str(port), str(i), "2", outs[i]],
            env=env, cwd=_REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    logs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-3000:]}"
    res = [json.load(open(o)) for o in outs]

    # topology: 2 processes x 2 local devices = 4 global devices
    for r in res:
        assert r["process_count"] == 2
        assert r["local_devices"] == 2
        assert r["global_devices"] == 4

    # both processes computed identical GLOBAL metric reductions
    assert res[0]["metrics"] == res[1]["metrics"]
    assert res[0]["metrics"]["n"] == 4

    # stitch the global result from the two processes' addressable shards
    # and compare against an in-process (single-host, 8-device) solve
    X_global = np.concatenate(
        [np.asarray(res[0]["X_local"]), np.asarray(res[1]["X_local"])])
    J_global = np.concatenate(
        [np.asarray(res[0]["J_local"]), np.asarray(res[1]["J_local"])])

    from dcol_tpu.parallel.batch import perturb_scenarios, solve_batch
    from dcol_tpu.systems import piano_mover

    sys_, params, X0, U0, cfg = piano_mover.make_problem(N=20)
    cfg = dataclasses.replace(cfg, max_iters=8)
    params_b, X0_b, U0_b = perturb_scenarios(params, X0, U0, n=4, seed=3,
                                             x0_sigma=0.05)
    st = solve_batch(sys_, params_b, cfg, X0_b, U0_b)
    np.testing.assert_allclose(X_global, np.asarray(st.X), rtol=1e-8,
                               atol=1e-10)
    np.testing.assert_allclose(J_global, np.asarray(st.J), rtol=1e-8)

    # phase 2: sharded closed-loop MPC with a cross-process checkpoint —
    # each worker verified 2 ticks -> per-shard checkpoint -> restore ->
    # 1 tick equals 3 straight ticks (BASELINE config-#5 shape); both
    # workers' resumed trajectories must also agree with an in-process run
    for r in res:
        assert r["mpc_resume_matches_straight"], r["process_id"]
    import jax

    from dcol_tpu.solver import mpc

    X3_global = np.concatenate(
        [np.asarray(res[0]["mpc_X3_local"]), np.asarray(res[1]["mpc_X3_local"])])
    U0_host = np.asarray(U0_b)[0]
    local3 = jax.jit(jax.vmap(
        lambda x0_: mpc.mpc_run(sys_, params, cfg, x0_, U0_host,
                                3)))(X0_b[:, 0, :])
    np.testing.assert_allclose(
        X3_global, np.asarray(local3.X_applied[:, 3]), rtol=1e-8, atol=1e-10)
