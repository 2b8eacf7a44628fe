"""Test configuration: run everything on a virtual 8-device CPU backend.

Multi-chip sharding tests use `xla_force_host_platform_device_count`, the
TPU-world replacement for the fake-backend pattern (SURVEY.md §4).

This image pins JAX_PLATFORMS=axon (the TPU tunnel) in the environment
and a sitecustomize re-registers the plugin, so env vars alone don't
win; the in-process `jax.config.update("jax_platforms", "cpu")` before
backend init does.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
