"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on a host-platform mesh (the driver
separately dry-runs the multichip path); the real-TPU path is exercised by
bench.py.  The session environment pins an 'axon' TPU platform that ignores
JAX_PLATFORMS, so the override happens through jax.config after import.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Evict compiled executables after every test module.

    A full-suite run in one process accumulates hundreds of large compiled
    programs; past ~60% of the suite XLA-CPU intermittently SEGFAULTS
    inside the next big compile (observed repeatedly at the then-current
    suite position, never in isolation — resource accumulation, e.g. JIT
    code mappings).  Clearing per module bounds the accumulation at the
    cost of recompiling shared kernels, which per-module shape diversity
    mostly forces anyway."""
    yield
    jax.clear_caches()
