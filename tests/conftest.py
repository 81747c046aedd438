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

# Persistent compilation cache: OFF.  A corrupt cache entry segfaults
# inside jax's cache READ path (observed once at
# test_sharding.py::test_sharded_matches_single_device, killing the
# whole suite run) — robustness beats the cross-run compile savings.
jax.config.update("jax_enable_compilation_cache", False)
