import os

# Multi-chip sharding tests run on a virtual 8-device CPU mesh; golden parity
# tests need float64. NOTE: this environment's sitecustomize registers a
# remote-TPU "axon" backend and forces JAX_PLATFORMS=axon, so the env var is
# not enough — jax.config.update after import is what actually selects CPU.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
