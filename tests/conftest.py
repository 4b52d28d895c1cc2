"""Test configuration: run everything on CPU with 8 fake devices so the
sharded path (stein_tpu.parallel) is exercised without TPU hardware, and
enable x64 so golden-trajectory tests can compare against the float64 NumPy
oracle bit-tightly.

Note: the env var JAX_PLATFORMS is not honoured in this environment (a TPU
platform plugin registers itself regardless), so we must select the platform
through jax.config before any backend initialisation.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
