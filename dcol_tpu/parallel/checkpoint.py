"""Checkpoint / resume of solver state (absent in the reference — SURVEY.md
§5: trajectories only live in RAM there).

Saves the full :class:`~dcol_tpu.solver.altro.AltroState` pytree — including
duals, penalty/regularisation schedule, constraint caches and metrics — so a
(batched) solve or a long MPC run survives host restarts.  Uses Orbax when
available and falls back to a plain .npz snapshot otherwise."""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dcol_tpu.solver.altro import AltroState, Metrics


def save(path: str, state: AltroState) -> None:
    """Snapshot a solver state (single or scenario-batched) to ``path``."""
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat, _ = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}
    np.savez(path, **arrays)


def load(path: str, like: Optional[AltroState] = None) -> AltroState:
    """Restore a snapshot.  ``like`` (an abstract or concrete state with the
    same structure) provides the pytree definition; without it the default
    AltroState structure is rebuilt from the flat leaves."""
    data = np.load(path)
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(data.files))]
    if like is not None:
        treedef = jax.tree_util.tree_structure(like)
        return jax.tree_util.tree_unflatten(treedef, leaves)
    n_metrics = len(Metrics._fields)
    return AltroState(*leaves[: len(AltroState._fields) - 1],
                      metrics=Metrics(*leaves[-n_metrics:]))


# -- Orbax-backed directory checkpoints (preferred for multi-host) ----------

def save_orbax(directory: str, state: AltroState, step: int = 0) -> None:
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(os.path.abspath(directory)) as mngr:
        mngr.save(step, args=ocp.args.StandardSave(state))
        mngr.wait_until_finished()


def load_orbax(directory: str, like: AltroState,
               step: Optional[int] = None) -> AltroState:
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(os.path.abspath(directory)) as mngr:
        step = mngr.latest_step() if step is None else step
        return mngr.restore(step, args=ocp.args.StandardRestore(like))
