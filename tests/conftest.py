"""Test environment: force CPU backend with 8 virtual devices.

Multi-chip sharding paths are validated on a virtual CPU mesh
(SURVEY.md §4): JAX must not have been imported before this runs, so
pytest must be launched from the repo root (conftest is imported first).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
