"""Test configuration: run everything on a virtual 8-device CPU backend.

Multi-chip sharding tests use `xla_force_host_platform_device_count`, the
TPU-world replacement for the fake-backend pattern (SURVEY.md §4).
Must run before jax is imported anywhere.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
