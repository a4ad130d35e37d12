"""Test config: force CPU with 8 virtual devices so multi-chip sharding logic
is exercised without TPU hardware (SURVEY.md §4d)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend and sets
# JAX_PLATFORMS=axon before conftest runs; the config knob wins over both.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: CPU-XLA compiles of the tiny towers dominate
# test wall-clock; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tooncrafter")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
