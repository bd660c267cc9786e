"""Diagnostic plots (parity with the reference's ``utils/plots.py``):
cost curve, state/control trajectories, constraint violations, and
regularization curve, written under ``result_images/<system>/``.

Host-side matplotlib over the solver's stacked per-iteration metrics
(the TPU-side solver records them in the state's ring buffer instead of
plotting mid-solve like the reference does, ALTRO.py:424-425)."""

from __future__ import annotations

import os

import numpy as np


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _outdir(system: str, sub: str = "") -> str:
    d = os.path.join("result_images", system, sub) if sub else os.path.join(
        "result_images", system)
    os.makedirs(d, exist_ok=True)
    return d


def mrp_to_euler(p):
    """MRP -> roll/pitch/yaw for plotting (cf. utils/plots.py:11-45)."""
    p = np.asarray(p)
    n2 = (p**2).sum(-1, keepdims=True)
    q_w = (1 - n2) / (1 + n2)
    q_xyz = 2 * p / (1 + n2)
    w, x, y, z = q_w[..., 0], q_xyz[..., 0], q_xyz[..., 1], q_xyz[..., 2]
    roll = np.arctan2(2 * (w * x + y * z), 1 - 2 * (x**2 + y**2))
    pitch = np.arcsin(np.clip(2 * (w * y - z * x), -1, 1))
    yaw = np.arctan2(2 * (w * z + x * y), 1 - 2 * (y**2 + z**2))
    return np.stack([roll, pitch, yaw], axis=-1)


def plot_cost(system: str, J: np.ndarray):
    plt = _mpl()
    d = _outdir(system, "costs")
    plt.figure(figsize=(7, 4))
    plt.plot(J)
    plt.xlabel("iteration")
    plt.ylabel("augmented-Lagrangian cost J")
    plt.yscale("log")
    plt.grid(alpha=0.3)
    plt.tight_layout()
    plt.savefig(os.path.join(d, "cost.png"), dpi=120)
    plt.close()


def plot_regularization(system: str, reg: np.ndarray, rho: np.ndarray):
    plt = _mpl()
    d = _outdir(system)
    plt.figure(figsize=(7, 4))
    plt.semilogy(reg, label="reg")
    plt.semilogy(rho, label="rho (AL penalty)")
    plt.xlabel("iteration")
    plt.legend()
    plt.grid(alpha=0.3)
    plt.tight_layout()
    plt.savefig(os.path.join(d, "regularization.png"), dpi=120)
    plt.close()


def plot_constraint_violation(system: str, convio: np.ndarray, kmax: np.ndarray):
    plt = _mpl()
    d = _outdir(system)
    plt.figure(figsize=(7, 4))
    plt.semilogy(np.maximum(convio, 1e-16), label="convio")
    plt.semilogy(np.maximum(kmax, 1e-16), label="|d| (kmax)")
    plt.xlabel("iteration")
    plt.legend()
    plt.grid(alpha=0.3)
    plt.tight_layout()
    plt.savefig(os.path.join(d, "constraint_violations.png"), dpi=120)
    plt.close()


def plot_trajectories(system: str, X: np.ndarray, U: np.ndarray, dt: float):
    plt = _mpl()
    d = _outdir(system)
    t = np.arange(X.shape[0]) * dt
    fig, axes = plt.subplots(2, 2, figsize=(11, 7))
    nx = X.shape[1]
    if nx >= 12:  # [r; v; p; w] systems
        axes[0, 0].plot(t, X[:, 0:3]); axes[0, 0].set_title("position")
        axes[0, 1].plot(t, X[:, 3:6]); axes[0, 1].set_title("velocity")
        axes[1, 0].plot(t, np.rad2deg(mrp_to_euler(X[:, 6:9])))
        axes[1, 0].set_title("attitude (deg)")
    else:  # piano mover
        axes[0, 0].plot(t, X[:, 0:2]); axes[0, 0].set_title("position")
        axes[0, 1].plot(t, X[:, 2:4]); axes[0, 1].set_title("velocity")
        axes[1, 0].plot(t, np.rad2deg(X[:, 4])); axes[1, 0].set_title("theta (deg)")
    axes[1, 1].plot(t[:-1], U); axes[1, 1].set_title("controls")
    for ax in axes.flat:
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(os.path.join(d, "trajectories.png"), dpi=120)
    plt.close(fig)


def plot_all(system: str, sys_, st):
    """Render every diagnostic plot from a finished AltroState."""
    n = int(min(int(st.iter), st.metrics.J.shape[0]))
    m = st.metrics
    plot_cost(system, np.asarray(m.J)[:n])
    plot_regularization(system, np.asarray(m.reg)[:n], np.asarray(m.rho)[:n])
    plot_constraint_violation(system, np.asarray(m.convio)[:n],
                              np.asarray(m.kmax)[:n])
    plot_trajectories(system, np.asarray(st.X), np.asarray(st.U), sys_.dt)
