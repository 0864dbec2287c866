"""Test config: force an 8-device virtual CPU mesh before JAX import.

Multi-chip hardware is not available in CI; sharding/pjit paths are
validated on a virtual CPU mesh per the project build rules.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
