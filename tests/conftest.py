"""Test config: force the CPU backend with 8 virtual devices so sharding
logic is exercised without TPU hardware (the SURVEY §4 strategy).

Note: this environment's sitecustomize registers an 'axon' TPU backend and
forces jax_platforms via jax.config — we override it back to cpu here,
before any backend is initialized.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the wavefront kernels are compile-heavy
# on the CPU backend; cache across test runs so only the first run pays.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
