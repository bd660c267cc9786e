"""Multi-process (multi-host) distributed runtime for scenario-parallel
solves.

The reference is single-process/single-thread (SURVEY.md §2.2: no
NCCL/MPI/Gloo anywhere); the TPU-native design scales by sharding the
scenario batch over a GLOBAL ``jax.sharding.Mesh`` spanning every process's
devices — ICI within a host's slice, DCN (gRPC) across hosts.  This module
is the thin process-topology layer:

  * :func:`initialize` — ``jax.distributed.initialize`` with sane defaults;
  * :func:`global_scenario_mesh` — one mesh over ALL processes' devices;
  * :func:`scatter_local` — build a globally-sharded scenario batch from
    per-process local shards (each host feeds only its own scenarios);
  * :func:`solve_scattered` — the sharded batched solve over that mesh;
  * :func:`gather_metrics` — the cross-host reductions (the only
    collectives this embarrassingly-parallel workload needs).

Exercised for real (two coordinated CPU processes over localhost DCN) by
``tests/test_distributed.py``; the same entry points drive a v5 pod slice
unchanged — only the coordinator address and device list differ.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str, num_processes: int,
               process_id: int, local_device_ids: Optional[Sequence[int]] = None):
    """Join the distributed runtime.  Call ONCE per process, before any
    device computation (mirrors ``jax.distributed.initialize``)."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)


def global_scenario_mesh(axis_name: str = "scenario") -> Mesh:
    """A 1-D mesh over every device of every process (global view)."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def scatter_local(mesh: Mesh, local_batch, axis_name: str = "scenario"):
    """Assemble a GLOBAL scenario-sharded pytree from this process's local
    shard.  ``local_batch`` leaves have leading dim = per-process scenarios;
    the global leading dim is that times ``process_count``.  Each process
    contributes only the data for its own devices (no cross-host copy)."""
    def put(a):
        a = np.asarray(a)
        global_shape = (a.shape[0] * jax.process_count(),) + a.shape[1:]
        sharding = NamedSharding(mesh, P(axis_name,
                                         *([None] * (a.ndim - 1))))
        return jax.make_array_from_process_local_data(sharding, a,
                                                      global_shape)

    return jax.tree_util.tree_map(put, local_batch)


def solve_scattered(sys, mesh: Mesh, params_b, cfg, X0_b, U0_b,
                    axis_name: str = "scenario"):
    """Sharded batched solve over a global mesh: inputs are global arrays
    (see :func:`scatter_local`); XLA SPMD partitions the vmapped solve from
    the INPUT shardings, and every process executes its addressable shard.

    ``mesh``/``axis_name`` are validated against the inputs (the solve
    itself needs nothing beyond the shardings already attached to them) —
    a mismatch means the caller scattered over a different mesh than it
    thinks it is solving on."""
    from dcol_tpu.parallel.batch import solve_batch

    sh = getattr(X0_b, "sharding", None)
    if not isinstance(sh, NamedSharding):
        raise ValueError(
            "solve_scattered expects mesh-sharded inputs (scatter_local); "
            f"X0_b has sharding {sh!r}")
    if sh.mesh.devices.tolist() != mesh.devices.tolist():
        raise ValueError(
            f"inputs are sharded over a different mesh {sh.mesh} than the "
            f"one passed in {mesh}")
    if sh.spec and sh.spec[0] != axis_name:
        raise ValueError(
            f"inputs are sharded over axis {sh.spec[0]!r}, expected "
            f"{axis_name!r}")
    return solve_batch(sys, params_b, cfg, X0_b, U0_b)


def gather_metrics(batched_state) -> dict:
    """Cross-host aggregate metrics: fully-replicated scalar reductions over
    the global sharded state (the only cross-process collectives needed)."""
    import jax.numpy as jnp

    n = batched_state.converged.shape[0]
    reduced = jax.jit(
        lambda st: (jnp.sum(st.converged), jnp.sum(st.failed),
                    jnp.mean(st.iter.astype(jnp.float32)),
                    jnp.max(st.convio)),
        out_shardings=NamedSharding(
            batched_state.converged.sharding.mesh, P()),
    )(batched_state)
    n_conv, n_fail, mean_it, max_cv = jax.device_get(reduced)
    return {
        "n": int(n),
        "n_converged": int(n_conv),
        "n_failed": int(n_fail),
        "mean_iters": float(mean_it),
        "max_convio": float(max_cv),
    }
