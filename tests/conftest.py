"""Test configuration: force JAX onto CPU with 8 virtual devices.

Real-TPU benchmarking happens in bench.py, not in tests; tests validate
numerics and the multi-chip sharding path on a simulated 8-device mesh.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
