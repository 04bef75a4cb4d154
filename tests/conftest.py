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
