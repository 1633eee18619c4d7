"""Test configuration: run everything on a virtual 8-device CPU mesh in
float64 (the reference is all-Float64; the parity suites depend on it).

The axon TPU plugin force-registers itself via sitecustomize and overrides
JAX_PLATFORMS, so we must switch platforms through jax.config after import.
XLA_FLAGS must still be set before the first jax import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite's dominant cost is XLA compiles of
# the big jitted steps/trim solvers/Jacobian passes; caching them across runs
# (keyed on HLO hash, so always safe) turns repeat suite runs from ~50 min
# into minutes on this 1-CPU box.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
