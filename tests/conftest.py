"""Test environment: force CPU backend with 8 virtual devices.

Multi-chip sharding paths are validated on a virtual CPU mesh (SURVEY.md §4).
Note: this machine's environment pre-sets JAX_PLATFORMS=axon (TPU tunnel) and
overrides the env var during jax import, so we must force the platform via
jax.config *after* import — but XLA_FLAGS still must be set before the CPU
backend initializes (it is lazy, so conftest import time is early enough).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from npge_tpu.util.jaxcache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
