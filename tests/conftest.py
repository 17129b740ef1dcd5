"""Test configuration: force the CPU backend with 8 virtual devices so all
sharding paths (TP over the "model" mesh axis) are exercised without TPU
hardware. Mirrors the reference's device-free unit-test strategy
(/root/reference/tests/core/test_cache_allocate.py runs the whole scheduling
brain on CPU)."""

import os

# must run before the JAX backend initializes
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
