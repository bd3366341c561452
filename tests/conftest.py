"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharding/collective behavior is
validated on the host platform with forced device count (the same mechanism
the driver uses for the multi-chip dry run).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
