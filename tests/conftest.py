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

# Persistent XLA compilation cache: the suite is compile-dominated (tiny
# models, hundreds of jitted programs), and the per-module clear_caches()
# below forces recompiles that the disk cache turns into ~10 ms loads.
# Populated on the first run; later runs (and chunked CI invocations, which
# previously recompiled every module fixture per chunk) start warm.
# Disable with SSR_JAX_CACHE=0 for a hermetic cold-timing run.
if os.environ.get("SSR_JAX_CACHE", "1") != "0":
    _cache_dir = os.environ.get(
        "SSR_JAX_CACHE_DIR",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    The suite compiles hundreds of XLA programs in one process; keeping them
    all live was enough to segfault the XLA CPU compiler near the end of the
    run (reproducibly, around test_training's shard_map pipeline tests).
    Each module recompiles what it needs anyway, so this only trades a
    little wall time for bounded memory."""
    yield
    jax.clear_caches()
