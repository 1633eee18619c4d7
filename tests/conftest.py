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
