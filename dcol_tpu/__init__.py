"""dcol_tpu: TPU-native differentiable-collision trajectory optimization.

A from-scratch JAX/XLA re-design of the capabilities of
CogSP/DCOL-trajectory-optimization (see SURVEY.md): batched PDIP conic
solves for differentiable proximity between convex primitives, envelope-
theorem gradients, and an AL-iLQR (ALTRO) trajectory optimizer — vmappable
over scenarios and shardable over device meshes.
"""

import jax as _jax

# The interior-point and Riccati linear algebra operates on tiny (<=24x8)
# ill-conditioned matrices; TPU's default f32 matmul (bf16 passes on the MXU)
# loses ~8 mantissa bits and breaks Cholesky feasibility near convergence.
# Full-f32 accumulation costs nothing at these sizes.  Pallas kernels that
# want bf16 MXU throughput request it explicitly.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache (opt-in via DCOL_TPU_CACHE=<dir>): the
# solver's jitted programs are large and recompiling per process costs 30s+.
# Opt-in only — interactions with this container's remote-compile relay are
# not fully vetted.
import os as _os

_cache_dir = _os.environ.get("DCOL_TPU_CACHE", "")
if _cache_dir:
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 - older jax without the option
        pass

__version__ = "0.1.0"
