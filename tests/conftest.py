"""Test configuration: run on a virtual 8-device CPU mesh with f64 enabled.

The container's sitecustomize force-registers the 'axon' TPU-tunnel platform
and sets jax_platforms="axon,cpu"; tests must override it HARD (every eager op
on axon is an RPC over the relay).  Benchmarks (bench.py) run on the real TPU
in f32; tests validate numerics in f64 plus explicit f32 cases.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """The XLA CPU compiler in this container segfaults deterministically
    after ~54 cumulative test compilations in one process (reproduced at two
    unrelated commits; crash is inside backend_compile_and_load).  Dropping
    live executables between test modules keeps the per-process compilation
    load under the threshold.  Costs a few recompiles; the full suite stays
    green."""
    yield
    jax.clear_caches()
