"""Unrolled small-matrix Cholesky for batched tiny systems (n <= ~12).

XLA's generic batched ``cholesky``/``triangular_solve`` lower to loop-heavy
code that maps poorly onto the TPU VPU for matrices this small.  Since n is
static and tiny, we unroll Cholesky-Banachiewicz and the two triangular
substitutions at trace time: every scalar of the factorisation becomes one
vectorised op over the batch, which XLA fuses into a handful of VPU kernels.
This is the TPU-native analogue of the reference's per-problem
``scipy.linalg.cho_factor/cho_solve`` calls (``proximity/pdip.py:434-436``).
"""

from __future__ import annotations

import jax.numpy as jnp


def chol_factor(M, jitter: float = 0.0):
    """Lower-triangular L with L L' = M (+ jitter * mean-diag * I).

    M: (..., n, n) symmetric positive definite.  Returns (..., n, n).
    """
    n = M.shape[-1]
    if jitter:
        eps = jitter * jnp.mean(jnp.diagonal(M, axis1=-2, axis2=-1), axis=-1)
        M = M + eps[..., None, None] * jnp.eye(n, dtype=M.dtype)
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = M[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    rows = [
        jnp.stack(
            [L[i][j] if j <= i else jnp.zeros_like(M[..., 0, 0]) for j in range(n)],
            axis=-1,
        )
        for i in range(n)
    ]
    return jnp.stack(rows, axis=-2)


def chol_solve(L, b):
    """Solve (L L') x = b with unrolled forward/backward substitution.

    L: (..., n, n) lower-triangular; b: (..., n).
    """
    n = L.shape[-1]
    # reciprocal diagonal once: each entry feeds the forward AND backward
    # substitution (VPU divides are multi-cycle)
    rd = [1.0 / L[..., i, i] for i in range(n)]
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[..., i, k] * y[k]
        y[i] = s * rd[i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[..., k, i] * x[k]
        x[i] = s * rd[i]
    return jnp.stack(x, axis=-1)
