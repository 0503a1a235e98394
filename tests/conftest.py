"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding logic is exercised without TPU hardware (SURVEY.md section 4c)."""

import os

# Must run before jax is imported anywhere in the test session. Force CPU
# even if the ambient environment points at a TPU platform: the test suite
# exercises math + sharding logic, not hardware.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
