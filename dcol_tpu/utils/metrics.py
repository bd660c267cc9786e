"""Observability helpers: throughput counters, timing, and profiler traces.

The reference ships only post-hoc cProfile dumps (SURVEY.md §5); here the
solver exposes structured per-iteration metrics in its state (see
``AltroState.metrics``), and this module adds host-side aggregation plus
``jax.profiler`` integration for TPU traces."""

from __future__ import annotations

import contextlib
import json
import time
from typing import Iterator

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer that blocks on device work."""

    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *a):
        self.elapsed = time.time() - self.t0


def block(tree):
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    return tree


def throughput(fn, *args, reps: int = 5, warmup: int = 1) -> dict:
    """{wall_s, per_call_s} for a device function, excluding compile."""
    for _ in range(warmup):
        block(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    block(out)
    wall = time.time() - t0
    return {"wall_s": wall, "per_call_s": wall / reps}


def iteration_table(state, limit: int | None = None) -> str:
    """Format the solver's metric ring buffer like the reference's stdout
    table (ALTRO.py:437-440)."""
    n = int(min(int(state.iter), state.metrics.J.shape[0]))
    if limit:
        n = min(n, limit)
    m = state.metrics
    lines = []
    if int(state.iter) > state.metrics.J.shape[0]:
        nb = state.metrics.J.shape[0]
        lines.append(
            f"[metrics buffer truncated: {int(state.iter)} iterations ran "
            f"but the buffer holds {nb}; iterations {nb}..{int(state.iter)} "
            f"all wrote the last slot — raise AltroConfig.metrics_len for "
            "the full history]")
    lines += ["iter     J           dJ        |d|         a        reg"
              "         rho", "-" * 69]
    for i in range(n):
        lines.append(
            f"{i+1:3d}   {float(m.J[i]):10.3e}  {float(m.delta_J[i]):9.2e}"
            f"  {float(m.kmax[i]):9.2e}  {float(m.alpha[i]):6.4f}"
            f"   {float(m.reg[i]):9.2e}   {float(m.rho[i]):9.2e}")
    return "\n".join(lines)


def batch_summary_json(batched_state, wall_s: float) -> str:
    """One-line JSON summary for scenario batches (solves/s, convergence)."""
    import jax.numpy as jnp

    n = int(batched_state.converged.shape[0])
    return json.dumps({
        "n_scenarios": n,
        "solves_per_s": round(n / wall_s, 3),
        "converged": int(jnp.sum(batched_state.converged)),
        "failed": int(jnp.sum(batched_state.failed)),
        "mean_iters": round(float(jnp.mean(batched_state.iter)), 2),
        "p50_iters": float(np.percentile(np.asarray(batched_state.iter), 50)),
        "max_convio": float(jnp.max(batched_state.convio)),
    })
