"""Test harness config: force CPU with a virtual 8-device mesh so sharding
tests run without TPU hardware (SURVEY.md §4 test plan).

The axon TPU plugin in this environment overrides the JAX_PLATFORMS env var,
so the platform is forced through jax.config before any backend is
initialized."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
