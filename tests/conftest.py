"""Test harness: force an 8-device virtual CPU mesh before jax initializes.

This is the TPU-world analogue of the reference's (vestigial) WORLD_SIZE=2
distributed CI (reference: Makefile:9-15, .github/workflows/pytest-cpu.yaml:57)
— sharding/pjit tests run against 8 simulated devices on one host.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
