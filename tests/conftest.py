"""Test harness: force an 8-device virtual CPU platform so multi-chip
sharding paths compile and execute without TPU hardware.

Note: this image pins JAX_PLATFORMS=axon in the profile and the env var is
not honored; `jax.config.update("jax_platforms", ...)` is, so we use that
BEFORE any jax computation runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
