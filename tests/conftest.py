"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; per the project testing
strategy (README), sharding logic is validated on a host-platform mesh with
8 virtual devices.  These env vars must be set before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Some environments pin jax to a hardware plugin via a startup hook
# that overrides the env var; force the CPU platform through the
# config API as well (must happen before any backend is initialised).
import jax

jax.config.update("jax_platforms", "cpu")
