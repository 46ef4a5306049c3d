"""Test configuration: force an 8-device virtual CPU mesh before any jax use.

This is how multi-chip sharding is tested without TPU hardware (SURVEY.md §4).
NOTE: under the axon TPU tunnel the JAX_PLATFORMS env var is overridden, so
we must force the platform through jax.config instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
