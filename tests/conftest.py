"""Test configuration: force an 8-device virtual CPU mesh (SURVEY.md §4.4).

Tests never touch the real TPU; sharding/distributed behaviour is
validated on 8 virtual CPU devices, and Pallas kernels run in interpreter
mode on CPU (the kernel dispatchers auto-detect the backend).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
