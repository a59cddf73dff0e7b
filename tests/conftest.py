"""Test configuration: force an 8-virtual-device CPU JAX backend.

Must set env vars before jax is imported anywhere, so this lives at the top
of conftest. Multi-chip sharding tests run against the virtual CPU mesh.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
