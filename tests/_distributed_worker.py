"""Subprocess worker for tests/test_distributed.py: one process of a
2-process jax.distributed run on CPU devices over localhost DCN.

Usage: python tests/_distributed_worker.py <coordinator_port> <process_id> \
           <num_processes> <out_json>

Each process owns 2 virtual CPU devices and contributes 2 scenarios of a
4-scenario global piano-mover batch; results (its addressable shards plus
globally-reduced metrics) are dumped to <out_json>.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

port, pid, nproc, out_path = (sys.argv[1], int(sys.argv[2]), int(sys.argv[3]),
                              sys.argv[4])

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from dcol_tpu.parallel import distributed  # noqa: E402
from dcol_tpu.parallel.batch import perturb_scenarios  # noqa: E402
from dcol_tpu.systems import piano_mover  # noqa: E402

distributed.initialize(f"localhost:{port}", nproc, pid)
assert jax.process_count() == nproc
n_local_dev = jax.local_device_count()

sys_, params, X0, U0, cfg = piano_mover.make_problem(N=20)
import dataclasses

cfg = dataclasses.replace(cfg, max_iters=8)  # determinism, not convergence

# the GLOBAL batch: 2 scenarios per process, deterministic perturbations
n_global = 2 * nproc
params_g, X0_g, U0_g = perturb_scenarios(params, X0, U0, n=n_global, seed=3,
                                         x0_sigma=0.05)
lo, hi = 2 * pid, 2 * (pid + 1)
local = (jax.tree_util.tree_map(lambda a: np.asarray(a)[lo:hi], params_g),
         np.asarray(X0_g)[lo:hi], np.asarray(U0_g)[lo:hi])

mesh = distributed.global_scenario_mesh()
params_b, X0_b, U0_b = distributed.scatter_local(mesh, local)
st = distributed.solve_scattered(sys_, mesh, params_b, cfg, X0_b, U0_b)
metrics = distributed.gather_metrics(st)

# this process's addressable scenario rows of the final state
shards = sorted(st.X.addressable_shards, key=lambda s: s.index[0].start or 0)
X_local = np.concatenate([np.asarray(s.data) for s in shards], axis=0)
J_local = np.concatenate(
    [np.asarray(s.data).reshape(-1)
     for s in sorted(st.J.addressable_shards,
                     key=lambda s: (s.index[0].start or 0))])

# ---------------------------------------------------------------------------
# Phase 2 (BASELINE config-#5 shape): scenario-sharded closed-loop MPC with a
# cross-process checkpoint/restore mid-run.  Each process checkpoints only its
# ADDRESSABLE shard of the MpcCarry (per-host shard files, the multi-host
# checkpoint pattern), "restarts", reassembles the global carry from its own
# shard via scatter_local, and resumes.  3 straight ticks must equal
# 2 ticks -> checkpoint -> restore -> 1 tick.
# ---------------------------------------------------------------------------
from dcol_tpu.solver import mpc  # noqa: E402

x0s_g = np.asarray(X0_g)[:, 0, :]  # (n_global, nx) per-scenario start states
x0s = distributed.scatter_local(
    mesh, np.ascontiguousarray(x0s_g[lo:hi]))
U0_host = np.asarray(U0_g)[0]  # hoisted: np conversion is illegal mid-trace


def run_steps(n, x0s):
    return jax.jit(jax.vmap(
        lambda x0_: mpc.mpc_run(sys_, params, cfg, x0_, U0_host, n)))(x0s)


straight = run_steps(3, x0s)

part1 = run_steps(2, x0s)
# per-process checkpoint of the addressable shard of the carry
ckpt_path = out_path + f".mpc_ckpt_p{pid}.npz"
carry_local = {}
for name, leaf in part1.final._asdict().items():
    shards = sorted(leaf.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    carry_local[name] = np.concatenate(
        [np.asarray(s.data) for s in shards], axis=0)
np.savez(ckpt_path, **carry_local)

# "restart": reload the shard, reassemble the GLOBAL carry, resume 1 tick
loaded = np.load(ckpt_path)
carry_g = mpc.MpcCarry(**{
    name: distributed.scatter_local(mesh, loaded[name])
    for name in mpc.MpcCarry._fields})
resumed = jax.jit(jax.vmap(
    lambda c: mpc.mpc_run(sys_, params, cfg, c.x, U0_host, 1,
                          resume_from=c)))(carry_g)


def local_rows(arr):
    shards = sorted(arr.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


mpc_match = bool(np.allclose(
    local_rows(straight.X_applied)[:, 3],      # state after tick 3
    local_rows(resumed.X_applied)[:, 1],       # = 1 resumed tick after ckpt
    rtol=1e-10, atol=1e-12))

with open(out_path, "w") as f:
    json.dump({
        "process_id": pid,
        "process_count": jax.process_count(),
        "local_devices": n_local_dev,
        "global_devices": jax.device_count(),
        "metrics": metrics,
        "rows": [lo, hi],
        "X_local": X_local.tolist(),
        "J_local": J_local.tolist(),
        "mpc_resume_matches_straight": mpc_match,
        "mpc_X3_local": local_rows(resumed.X_applied)[:, 1].tolist(),
    }, f)
print("worker", pid, "done", flush=True)
