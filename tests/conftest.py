"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding tests run on the CPU backend with
``xla_force_host_platform_device_count=8`` — JAX's standard fake-multichip
backend — so shard_map/pjit/psum paths are exercised without TPU hardware.
Must run before the first jax import anywhere in the test session.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# NOTE: the JAX_PLATFORMS env var is overridden by the installed TPU plugin in
# this image; only the config API reliably selects the cpu backend.
jax.config.update("jax_platforms", "cpu")

# Tests validate fp32 numerics; production code sets precision explicitly
# where parity matters.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the host has one core and cold XLA-CPU
# compiles dominate test wall-clock otherwise.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
