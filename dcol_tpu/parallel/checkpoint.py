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


def _entry_idx(entry, parent_fields) -> int:
    """Index of one pytree path entry: namedtuples flatten with GetAttrKey
    (field name), plain tuples with SequenceKey (index)."""
    if hasattr(entry, "idx"):
        return entry.idx
    return parent_fields.index(entry.name)


def _path_key(path) -> str:
    """Dotted index path for one leaf, e.g. ``10.0.2`` = field 10 (warm),
    group 0, leaf 2 (z)."""
    idxs = []
    fields = AltroState._fields
    for entry in path:
        i = _entry_idx(entry, fields)
        idxs.append(str(i))
        fields = Metrics._fields if fields is AltroState._fields and \
            AltroState._fields[i] == "metrics" else ()
    return ".".join(idxs)


def save(path: str, state: AltroState) -> None:
    """Snapshot a solver state (single or scenario-batched) to ``path``.
    Each leaf is stored under its pytree index path, so ``load`` can rebuild
    the nested structure (the per-group ``warm`` tuple, the ``metrics``
    namedtuple) without a template."""
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat, _ = jax.tree_util.tree_flatten_with_path(state)
    arrays = {f"leaf_{_path_key(p)}": np.asarray(x) for p, x in flat}
    np.savez(path, **arrays)


def load(path: str, like: Optional[AltroState] = None) -> AltroState:
    """Restore a snapshot.  ``like`` (an abstract or concrete state with the
    same structure), if given, provides the pytree definition; otherwise the
    structure is rebuilt from the index paths stored by ``save``."""
    data = np.load(path)
    if like is not None:
        # order leaves by index path = flatten order of the template
        keys = sorted(data.files,
                      key=lambda k: [int(s) for s in k[5:].split(".")])
        leaves = [jnp.asarray(data[k]) for k in keys]
        treedef = jax.tree_util.tree_structure(like)
        return jax.tree_util.tree_unflatten(treedef, leaves)
    if not any("." in k for k in data.files):
        raise ValueError(
            f"{path} is a legacy flat snapshot (leaf_<i> names); it does not "
            "record the nested warm/metrics structure — pass like=")
    nested: dict = {}
    for k in data.files:
        parts = [int(s) for s in k[5:].split(".")]
        d = nested
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(data[k])

    def to_tuple(d):
        return tuple(to_tuple(d[i]) if isinstance(d[i], dict) else d[i]
                     for i in range(len(d)))

    fields = list(to_tuple(nested))
    mi = AltroState._fields.index("metrics")
    fields[mi] = Metrics(*fields[mi])
    return AltroState(*fields)


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
