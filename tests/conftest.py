"""Test configuration: force JAX onto CPU with 8 virtual devices.

Real-TPU benchmarking happens in bench.py, not in tests; tests validate
numerics and the multi-chip sharding path on a simulated 8-device mesh.

Note: with the axon TPU plugin, the JAX_PLATFORMS env var alone is not
honored — jax.config.update('jax_platforms', ...) is required.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
