"""Test harness config: CPU backend with 8 virtual devices + float64.

The container's sitecustomize imports jax at interpreter startup and pins
``JAX_PLATFORMS=axon`` (the remote-TPU tunnel), so env vars set here are too
late; ``jax.config.update`` works at any time. The 8 virtual CPU devices let
the multi-chip sharding tests exercise a real `jax.sharding.Mesh` without
TPU hardware (SURVEY.md §5 "lesson for the TPU build").
"""

import os

# XLA_FLAGS is read lazily at backend init, which hasn't happened yet.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
