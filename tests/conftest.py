"""Test config: run JAX on a virtual 8-device CPU mesh with fp32 matmuls.

Must run before the first ``import jax`` anywhere in the test process
(mirrors how the driver validates multi-chip sharding). The axon TPU
plugin registers itself through sitecustomize when PALLAS_AXON_POOL_IPS
is set and *overrides* JAX_PLATFORMS — clearing it here is what actually
keeps unit tests off the (slow, tunneled) real chip.
"""

import os

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
# module-level use_pallas_* flags fall back to XLA off-TPU; the kernel
# equivalence tests deliberately exercise interpret mode on CPU
os.environ["PALLAS_INTERPRET_OK"] = "1"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
