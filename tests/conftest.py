import os

# Force the virtual 8-device CPU mesh for tests: multi-chip sharding paths are
# exercised without TPU hardware, and float32 numerics are exact (TPU 'axon'
# matmuls default to reduced precision, which would break parity tolerances).
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_default_matmul_precision", "highest")
