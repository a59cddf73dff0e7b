"""Test configuration: force an 8-virtual-device CPU JAX backend.

Must set env vars before jax is imported anywhere, so this lives at the top
of conftest. Multi-chip sharding tests run against the virtual CPU mesh.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The image's sitecustomize.py registers the axon TPU backend in every
# process and force-sets jax_platforms='axon,cpu', overriding the env var.
# Re-override to CPU before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
