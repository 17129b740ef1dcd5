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

import jax  # noqa: E402

# MINISGL_TPU_TESTS=1 keeps the real TPU visible (kernel tests compile
# natively there); default is the 8-virtual-device CPU mesh.
if os.environ.get("MINISGL_TPU_TESTS") != "1":
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    jax.config.update("jax_platforms", "cpu")
