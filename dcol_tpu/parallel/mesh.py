"""Device-mesh scaling: shard scenario batches over a ``jax.sharding.Mesh``.

Parallelism design for this workload (SURVEY.md §2.2): the trajectory horizon
is short (N <= 100) and the Riccati recursion is sequential, so the scaling
axis is the *scenario* batch — embarrassingly parallel over chips/hosts, with
collectives needed only for aggregate metrics.  Shardings are annotated and
XLA SPMD partitions the whole vmapped solve; the scenario axis rides ICI
within a slice, DCN across hosts (``jax.distributed``).

Multi-host usage: call ``jax.distributed.initialize()`` before building the
mesh; this module only deals in global meshes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dcol_tpu.parallel.batch import solve_batch
from dcol_tpu.solver import altro


def scenario_mesh(devices: Optional[Sequence] = None,
                  axis_name: str = "scenario") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_scenarios(mesh: Mesh, params_b, X0_b, U0_b,
                    axis_name: str = "scenario"):
    """Place a scenario batch with the leading axis sharded over the mesh."""
    def put(a):
        spec = P(axis_name, *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return (jax.tree_util.tree_map(put, params_b), put(X0_b), put(U0_b))


def solve_batch_sharded(sys, mesh: Mesh, params_b, cfg: altro.AltroConfig,
                        X0_b, U0_b, axis_name: str = "scenario"):
    """Scenario-sharded batched solve.  The batch size must divide the mesh
    size.  Returns the batched AltroState with outputs sharded like inputs."""
    params_b, X0_b, U0_b = shard_scenarios(mesh, params_b, X0_b, U0_b,
                                           axis_name)
    return solve_batch(sys, params_b, cfg, X0_b, U0_b)


def summarize(batched_state) -> dict:
    """Aggregate metrics across a (possibly sharded) batch; the reductions are
    the only cross-device collectives this workload needs."""
    import jax.numpy as jnp

    return {
        "n": int(batched_state.converged.shape[0]),
        "n_converged": int(jnp.sum(batched_state.converged)),
        "n_failed": int(jnp.sum(batched_state.failed)),
        "mean_iters": float(jnp.mean(batched_state.iter)),
        "max_convio": float(jnp.max(batched_state.convio)),
    }
