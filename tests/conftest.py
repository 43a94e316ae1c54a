"""Test config: run JAX on a virtual 8-device CPU mesh with fp32 matmuls.

Must set env vars before the first ``import jax`` anywhere in the test
process (mirrors how the driver validates multi-chip sharding)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
