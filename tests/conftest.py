"""Test configuration: force an 8-device virtual CPU mesh (SURVEY.md §4.4).

Tests never touch the real TPU; sharding/distributed behaviour is
validated on 8 virtual CPU devices, and Pallas kernels run in interpreter
mode on CPU (the kernel dispatchers auto-detect the backend).

NOTE: this environment's sitecustomize imports jax at interpreter start
with JAX_PLATFORMS=axon (the real-TPU tunnel), so plain env vars are read
too late — the platform must be forced through jax.config here, before
any backend is initialised.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
