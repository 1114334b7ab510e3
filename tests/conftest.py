import os

# Virtual 8-device CPU mesh: multi-chip sharding paths run without TPU
# hardware, and float32 numerics are exact for the torch-parity tests.
# NOTE: the axon TPU plugin overrides the JAX_PLATFORMS env var, so the
# platform must be forced through jax.config AFTER import.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
